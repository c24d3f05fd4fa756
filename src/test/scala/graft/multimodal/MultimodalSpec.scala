package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets =
    Multimodal.syntheticAssets(Tables.documents(spark, sf()))

  test("syntheticAssets carries binary payload + typed meta") {
    val r = assets.filter($"asset_id" === 3L).head()
    assert(r.getAs[Array[Byte]]("media").nonEmpty)
    val meta = r.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[Int]("width") == (3 % 64) + 16)
  }

  test("withDecodedMeta decodes the stub header batch-wise; meta matches payload") {
    val decoded = Multimodal.withDecodedMeta(assets)
    val rows = decoded.select("asset_id", "decoded_width", "decoded_height", "decode_ok")
      .as[(Long, Option[Int], Option[Int], Boolean)].collect()
    assert(rows.nonEmpty && rows.forall(_._4), "all synthetic payloads decode")
    rows.foreach { case (id, w, h, _) =>
      assert(w.contains(((id % 64) + 16).toInt), s"asset $id width")
      assert(h.contains(((id * 7 % 64) + 16).toInt))
    }
  }

  test("withDecodedMeta marks corrupt payloads instead of failing") {
    val bad = Seq((1L, "image", "not a header".getBytes,
      (16, 16, 1, 16000, "stub"))).toDF("asset_id", "media_type", "media", "m")
      .withColumn("meta", struct($"m._1".as("width"), $"m._2".as("height"),
        $"m._3".as("n_frames"), $"m._4".as("sample_rate"), $"m._5".as("format"))).drop("m")
    val got = Multimodal.withDecodedMeta(bad)
      .select("decode_ok").as[Boolean].collect()
    assert(got.toSeq == Seq(false))
  }

  test("resize computes bounded dimensions from meta only (no byte touch)") {
    val r = Multimodal.resize(assets, maxDim = 32)
      .select("asset_id", "meta.width", "resized_width", "resized_height")
      .collect()
    r.foreach { row =>
      assert(row.getAs[Int]("resized_width") <= 32 || row.getAs[Int]("resized_height") <= 32)
    }
  }

  test("sampleFrames explodes video assets into frame rows with replicated keys") {
    val videos = assets.filter($"media_type" === "video")
    val frames = Multimodal.sampleFrames(videos, everyN = 2)
    val byAsset = frames.groupBy("asset_id").count().as[(Long, Long)].collect().toMap
    // asset_id % 3 == 0 are videos with n_frames = id % 10 + 1 → ceil(n/2) sampled
    byAsset.foreach { case (id, n) =>
      val expected = ((id % 10) + 1 + 1) / 2
      assert(n == expected, s"asset $id: $n frames, expected $expected")
    }
    assert(byAsset.nonEmpty)
  }

  test("hashFeatures is deterministic Column algebra in [0,1)") {
    val f1 = assets.select($"asset_id", Multimodal.hashFeatures($"media").as("f"))
      .as[(Long, Seq[Double])].collect().toMap
    val f2 = assets.select($"asset_id", Multimodal.hashFeatures($"media").as("f"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(f1 == f2)
    assert(f1.values.forall(v => v.length == 8 && v.forall(x => x >= 0.0 && x < 1.0)))
  }

  test("hashFeature(i) scalar equals hashFeatures array element i") {
    val dims = 8
    val scalarCols = (0 until dims).map(i => Multimodal.hashFeature($"media", i))
    val arr = assets
      .select($"asset_id", Multimodal.hashFeatures($"media").as("fa"), array(scalarCols: _*).as("fs"))
      .as[(Long, Seq[Double], Seq[Double])].collect()
    arr.foreach { case (id, fa, fs) => assert(fa == fs, s"asset $id") }
  }

  test("withPerceptualHash: deterministic, 62-bit range, duplicates collide") {
    val h1 = Multimodal.withPerceptualHash(assets)
      .select($"asset_id", $"phash").as[(Long, Long)].collect().toMap
    val h2 = Multimodal.withPerceptualHash(assets)
      .select($"asset_id", $"phash").as[(Long, Long)].collect().toMap
    assert(h1 == h2, "hash is deterministic")
    assert(h1.values.forall(v => v >= 0L && v < (1L << 62)), "62-bit non-negative")
    assert(h1.values.toSet.size > 1, "distinct payloads spread across hashes")
    // identical payloads MUST collide (the dedup contract)
    val dup = assets.limit(1).union(assets.limit(1))
    val hs = Multimodal.withPerceptualHash(dup).select($"phash").as[Long].collect()
    assert(hs.length == 2 && hs(0) == hs(1))
  }

  test("sceneChanges: known payload produces exact frame diffs and cut flags") {
    // 2 frames of 16 samples: frame 1 all 'a' (97), frame 2 all 'q' (113)
    // → one boundary, diff = 16 * |113-97| = 256, below the 512 cut line
    val twoFrames = Seq((1L, "W:16;H:16;F:2;" + "a" * 16 + "q" * 16))
      .toDF("asset_id", "m").withColumn("media", $"m".cast("binary")).drop("m")
    val r = Multimodal.sceneChanges(twoFrames)
      .select($"boundary", $"diff", $"is_cut").as[(Int, Long, Boolean)].collect()
    assert(r.toSeq == Seq((1, 256L, false)))
    // hard cut: frame 2 jumps 97 → 'A' (65), diff = 16*32 = 512 (not a
    // cut — strict >), frame 3 back to 97+36=133? use '~' (126): 16*61 = 976 → cut
    val threeFrames = Seq((2L, "W:16;H:16;F:3;" + "a" * 16 + "A" * 16 + "~" * 16))
      .toDF("asset_id", "m").withColumn("media", $"m".cast("binary")).drop("m")
    val r3 = Multimodal.sceneChanges(threeFrames)
      .select($"boundary", $"diff", $"is_cut").as[(Int, Long, Boolean)].collect()
      .sortBy(_._1)
    assert(r3.toSeq == Seq((1, 512L, false), (2, 16L * 61, true)))
    // payload shorter than two frames → no boundaries, no rows
    val short = Seq((3L, "W:16;H:16;F:1;" + "a" * 20))
      .toDF("asset_id", "m").withColumn("media", $"m".cast("binary")).drop("m")
    assert(Multimodal.sceneChanges(short).count() == 0)
  }

  test("withPerceptualHash: constant pixel stream hashes to 0 (no bit strictly above mean)") {
    val const = Seq((1L, "W:16;H:16;F:1;" + "aaaaaaaaaaaa"))
      .toDF("asset_id", "m")
      .withColumn("media", $"m".cast("binary")).drop("m")
    val h = Multimodal.withPerceptualHash(const).select($"phash").as[Long].head()
    assert(h == 0L)
  }
}
