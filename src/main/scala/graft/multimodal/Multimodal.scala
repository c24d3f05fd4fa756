package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for a training-data pipeline: image/audio/video
  * travel as opaque `binary` columns + typed metadata structs; decode /
  * feature-extract / resize / frame-sample run batch-wise over
  * partitions (the Scala analogue of `mapInPandas`: one decoder
  * instantiation per partition, records processed in batches, schema
  * declared up front so Catalyst sees real columns).
  *
  * The decode internals are STUBBED (no image/audio libs in this
  * container): `StubCodec` is a deterministic fake that reads a
  * synthetic header. The Spark-side plumbing — schema, batch iteration,
  * partitioning, null/corrupt handling — is real and tested; swapping
  * `StubCodec` for a JNI/javacv codec changes no plan shape.
  */
object Multimodal {

  /** media: the opaque payload; meta: typed, queryable, and cheap to
    * carry next to the blob (partition pruning / filtering happens on
    * meta without touching bytes).
    */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image | audio | video
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_frames", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  final case class DecodedFrame(frameIdx: Int, width: Int, height: Int, pixels: Array[Byte])

  /** Codec boundary: one instance per partition (like a per-batch
    * Python worker). Implementations must be deterministic for tests.
    */
  trait Codec extends Serializable {
    def decodeImage(bytes: Array[Byte]): Option[DecodedFrame]
    def sampleFrames(bytes: Array[Byte], everyN: Int): Iterator[DecodedFrame]
  }

  /** STUB codec — deterministic fake. Payload layout (synthetic, for
    * tests): "W:<w>;H:<h>;F:<frames>;" header followed by raw bytes.
    * A real deployment swaps in an actual decoder here; everything
    * else in this file is production plumbing.
    */
  object StubCodec extends Codec {
    private val Header = """W:(\d+);H:(\d+);F:(\d+);""".r

    def decodeImage(bytes: Array[Byte]): Option[DecodedFrame] = {
      if (bytes == null) return None
      val s = new String(bytes, 0, math.min(bytes.length, 64), "UTF-8")
      Header.findPrefixMatchOf(s).map { m =>
        DecodedFrame(0, m.group(1).toInt, m.group(2).toInt,
          bytes.drop(m.matched.length))
      }
    }

    def sampleFrames(bytes: Array[Byte], everyN: Int): Iterator[DecodedFrame] =
      decodeImage(bytes) match {
        case None => Iterator.empty
        case Some(first) =>
          val nFrames = new String(bytes, 0, math.min(bytes.length, 64), "UTF-8") match {
            case s => Header.findPrefixMatchOf(s).map(_.group(3).toInt).getOrElse(1)
          }
          (0 until nFrames by everyN).iterator
            .map(i => first.copy(frameIdx = i))
      }
  }

  private val decodedMetaSchema = StructType(Seq(
    StructField("decoded_width", IntegerType), StructField("decoded_height", IntegerType),
    StructField("decode_ok", BooleanType)))

  /** Decode pass: batch-wise over partitions, appending decoded
    * metadata columns. Corrupt/undecodable payloads yield
    * decode_ok=false rows instead of failing the task (the FAIL_LIST
    * posture from the XML engine, applied to media).
    */
  def withDecodedMeta(df: DataFrame, codec: Codec = StubCodec,
                      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ decodedMetaSchema.fields)
    val mediaIdx = df.schema.fieldIndex("media")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>      // batch shape: amortizes codec state
        batch.iterator.map { r =>
          val decoded = codec.decodeImage(r.getAs[Array[Byte]](mediaIdx))
          Row.fromSeq(r.toSeq ++ Seq(
            decoded.map(_.width).orNull, decoded.map(_.height).orNull,
            decoded.isDefined))
        }
      }
    }(enc)
  }

  /** Resize: plumbing-real, math-stubbed (recompute meta; payload
    * passthrough). A real impl rewrites pixels in the same shape.
    */
  def resize(df: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("meta.width"), col("meta.height")).cast("double"))
    df.withColumn("resized_width", floor(col("meta.width") * scale).cast("int"))
      .withColumn("resized_height", floor(col("meta.height") * scale).cast("int"))
  }

  /** Frame sampling: video binary → one row per sampled frame
    * (flatMap = the UDTF/generator shape; parent keys replicated like
    * the XML engine's 1:M explode).
    */
  def sampleFrames(df: DataFrame, everyN: Int, codec: Codec = StubCodec): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType), StructField("frame_idx", IntegerType),
      StructField("width", IntegerType), StructField("height", IntegerType)))
    val idIdx = df.schema.fieldIndex("asset_id")
    val mediaIdx = df.schema.fieldIndex("media")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        codec.sampleFrames(r.getAs[Array[Byte]](mediaIdx), everyN)
          .map(f => Row(r.getLong(idIdx), f.frameIdx, f.width, f.height))
      }
    }(enc)
  }

  /** Feature extraction WITHOUT leaving Column algebra: deterministic
    * 8-dim pseudo-embedding from the payload hash — the pattern for
    * "cheap featurization stays codegen'd; only true decode needs the
    * partition boundary".
    */
  def hashFeatures(media: org.apache.spark.sql.Column, dims: Int = 8): org.apache.spark.sql.Column =
    transform(sequence(lit(0), lit(dims - 1)),
      i => (pmod(xxhash64(media, i), lit(1000L)).cast("double") / 1000.0))

  /** One feature dimension as a scalar column — same value as
    * `hashFeatures(media)(i)` without materializing the array (one
    * xxhash64 per requested dim instead of dims per column).
    */
  def hashFeature(media: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(media, lit(i)), lit(1000L)).cast("double") / 1000.0

  /** Oracle-able featurizer: one dim = the rolling fingerprint of the
    * payload (as text) with the dim index appended, normalized to
    * [0, 1). Slower than `hashFeature` (per-char fold vs one xxhash64)
    * but expressible in any engine with list folds — used by the m4
    * correctness query so the feature path is oracle-checked end to
    * end; production pipelines use `hashFeatures`.
    */
  def fingerprintFeature(media: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column =
    graft.functions.TextFunctions.rollingFingerprint(
      concat(media.cast("string"), lit(i.toString)))
      .cast("double") / 1000000007.0

  /** Windowed audio features over the raw payload stream — the
    * frame/hop analysis every audio pipeline runs before featurization
    * (RMS energy, zero-crossing rate, peak), expressed entirely in
    * Column algebra: one explode over the window grid, per-window
    * slice + fold. With the stub payload the "samples" are the byte
    * stream itself (ascii codes); a real PCM decode swaps in at the
    * same boundary as StubCodec and the windowing/fold plumbing is
    * unchanged. Scale shape: generator + codegen folds over the scan —
    * no shuffle at all.
    */
  def audioWindows(df: DataFrame, window: Int = 32, stride: Int = 16): DataFrame = {
    val payload = regexp_replace(col("media").cast("string"),
      "^W:\\d+;H:\\d+;F:\\d+;", "")
    val codes = transform(
      filter(split(payload, ""), c => length(c) > 0), c => ascii(c))
    val nw = when(size(col("codes")) >= window,
      ((size(col("codes")) - window) / stride).cast("int") + 1).otherwise(0)
    val wc = slice(col("codes"), col("widx") * stride + 1, lit(window))
    val sumSq = aggregate(col("wc"), lit(0L), (a, x) => a + x * x)
    val zc = aggregate(
      zip_with(slice(col("wc"), 1, window - 1), slice(col("wc"), 2, window - 1),
        (a, b) => when((a >= 128) =!= (b >= 128), 1).otherwise(0)),
      lit(0), (a, x) => a + x)
    df.select(col("asset_id"), codes.as("codes"))
      .withColumn("widx",
        explode(when(nw > 0, sequence(lit(0), nw - 1))
          .otherwise(array().cast("array<int>"))))
      .select(col("asset_id"), col("widx"), wc.as("wc"))
      .select(col("asset_id"), col("widx"),
        round(sqrt(sumSq.cast("double") / window), 6).as("rms"),
        zc.cast("int").as("zc"),
        array_max(col("wc")).as("peak"))
  }

  /** Synthetic asset table from the documents corpus (deterministic):
    * lets the media pipeline run against driver-provided testdata.
    */
  /** Average-hash perceptual fingerprint over the decoded "pixel"
    * stream (with the stub codec: ascii codes of the payload, same
    * boundary as `audioWindows`). Classic aHash: mean-threshold each
    * sample, pack the bit string into one integer. 62 bits, not 64 —
    * BIGINT bit 63 is the sign bit and engines disagree on shifting
    * into it, so 62 keeps the hash portable across engines/storage.
    * The mean threshold is the DIVISION-FREE form `code * n > sum`
    * (exact integer compare); the pack is an MSB-first fold
    * `acc*2 + bit` (no shift builtins needed). All per-row codegen
    * over the scan — zero shuffle; a real codec swaps in at the same
    * boundary as StubCodec with the hash algebra unchanged.
    */
  def withPerceptualHash(df: DataFrame, nBits: Int = 62): DataFrame = {
    val payload = regexp_replace(col("media").cast("string"),
      "^W:\\d+;H:\\d+;F:\\d+;", "")
    val codes = transform(
      filter(split(payload, ""), c => length(c) > 0), c => ascii(c).cast("long"))
    df.withColumn("_cs", slice(codes, 1, nBits))
      .withColumn("_n", size(col("_cs")).cast("long"))
      .withColumn("_sum", aggregate(col("_cs"), lit(0L), (a, b) => a + b))
      .withColumn("phash", aggregate(
        transform(col("_cs"),
          c => when(c * col("_n") > col("_sum"), lit(1L)).otherwise(lit(0L))),
        lit(0L), (a, b) => a * lit(2L) + b))
      .drop("_cs", "_n", "_sum")
  }

  /** Scene-change (cut) detection over the decoded frame stream: the
    * payload is framed into fixed-length windows and each consecutive
    * frame pair scores the sum of absolute per-sample differences; a
    * boundary is a cut when that integer score clears a threshold.
    * With the stub codec a "sample" is an ascii code (same boundary as
    * `audioWindows` / `withPerceptualHash`); a real decoder swaps in
    * with the diff algebra unchanged. All-integer per-row codegen over
    * the scan — zero shuffle; output grows one row per frame boundary.
    */
  def sceneChanges(df: DataFrame, frameLen: Int = 16,
                   threshold: Long = 512L): DataFrame = {
    val payload = regexp_replace(col("media").cast("string"),
      "^W:\\d+;H:\\d+;F:\\d+;", "")
    val codes = transform(
      filter(split(payload, ""), c => length(c) > 0), c => ascii(c).cast("long"))
    val prev = slice(col("cs"), (col("b") - 1) * frameLen + 1, lit(frameLen))
    val cur = slice(col("cs"), col("b") * frameLen + 1, lit(frameLen))
    val diff = aggregate(zip_with(prev, cur, (a, x) => abs(a - x)),
      lit(0L), (acc, v) => acc + v)
    df.select(col("asset_id"), codes.as("cs"))
      .withColumn("nf", expr(s"size(cs) div $frameLen").cast("int"))
      .withColumn("b",
        explode(when(col("nf") >= 2, sequence(lit(1), col("nf") - 1))
          .otherwise(array().cast("array<int>"))))
      .select(col("asset_id"), col("b").as("boundary"), diff.as("diff"))
      .withColumn("is_cut", col("diff") > threshold)
  }

  def syntheticAssets(documents: DataFrame): DataFrame = {
    val w = (pmod(col("doc_id"), lit(64)) + 16).cast("int")
    val h = (pmod(col("doc_id") * 7, lit(64)) + 16).cast("int")
    val f = (pmod(col("doc_id"), lit(10)) + 1).cast("int")
    documents.select(
      col("doc_id").as("asset_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "video")
        .when(pmod(col("doc_id"), lit(3)) === 1, "image").otherwise("audio").as("media_type"),
      concat(
        format_string("W:%d;H:%d;F:%d;", w, h, f),
        substring(col("text"), 1, 128)).cast("binary").as("media"),
      struct(w.as("width"), h.as("height"), f.as("n_frames"),
        lit(16000).as("sample_rate"), lit("stub").as("format")).as("meta"))
  }
}
