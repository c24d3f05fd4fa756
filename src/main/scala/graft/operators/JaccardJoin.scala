package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact token-set Jaccard similarity join with adaptive physical
  * strategy — the same result set under two plans:
  *
  *  - **Bitmap path** (vocabulary ≤ `vocabLimit` distinct tokens):
  *    each document's token set becomes a fixed-width bitmap
  *    (`ceil(V/64)` longs); pairs within a block are compared by
  *    popcount of AND. The blocked pair join is quadratic in block
  *    size but each comparison is a few dozen bitwise ops — right
  *    when a small vocabulary makes every token hot and an inverted
  *    index degenerates (Σ n_t² blow-up).
  *  - **Inverted-index path** (large vocabulary): explode distinct
  *    tokens, self-join on (block, token), count collisions —
  *    pair space materializes only where tokens collide. Right for
  *    real corpora where vocabulary is huge and collisions sparse.
  *
  * The choice is made from a cheap statistics probe (bounded distinct
  * count), the DataFrame-level analogue of a cost-based physical rule.
  * Both paths emit (id_a, id_b, jaccard) with jaccard computed from
  * the same integers |∩| and |A|+|B|-|∩| → bit-identical doubles.
  */
object JaccardJoin {

  def pairs(docs: DataFrame, idCol: String, blockCol: String, textCol: String,
            threshold: Double, vocabLimit: Int = 4096): DataFrame = {
    val t = docs.select(
        col(idCol).as("id"), col(blockCol).as("block"),
        array_distinct(split(col(textCol), " ")).as("toks"))
      .withColumn("n", size(col("toks")))
    val tok = t.select(col("id"), col("block"), col("n"), explode(col("toks")).as("tok"))

    // bounded-distinct probe: stops scanning distinct space past the limit
    val vocabSize = tok.select(col("tok")).distinct().limit(vocabLimit + 1).count().toInt
    if (vocabSize <= vocabLimit) bitmapPath(t, tok, vocabSize, threshold)
    else invertedPath(tok, threshold)
  }

  private def bitmapPath(t: DataFrame, tok: DataFrame, vocabSize: Int,
                         threshold: Double): DataFrame = {
    val nWords = (vocabSize + 63) / 64
    val vocab = tok.select(col("tok")).distinct()
      .withColumn("tid", row_number().over(Window.orderBy(col("tok"))) - 1)

    val ids = tok.join(broadcast(vocab), "tok")
      .groupBy(col("id"), col("block"), col("n"))
      .agg(collect_list(col("tid")).as("tids"))
    val words: Seq[Column] = (0 until nWords).map { w =>
      aggregate(col("tids"), lit(0L), (acc, tid) =>
        when((tid.cast("long") / 64).cast("int") === w,
          acc.bitwiseOR(call_function("shiftleft", lit(1L), pmod(tid, lit(64)).cast("int"))))
          .otherwise(acc)).as(s"w$w")
    }
    val bm = ids.select(Seq(col("id"), col("block"), col("n")) ++ words: _*)

    val aCols = bm.columns.map(c => col(c).as(s"a_$c"))
    val bCols = bm.columns.map(c => col(c).as(s"b_$c"))
    val a = bm.select(aCols.toSeq: _*)
    val b = bm.select(bCols.toSeq: _*)
    val inter: Column = (0 until nWords)
      .map(w => bit_count(col(s"a_w$w").bitwiseAND(col(s"b_w$w"))).cast("long"))
      .reduce(_ + _)
    a.join(b, col("a_block") === col("b_block") && col("a_id") < col("b_id")
        && col("a_n") <= col("b_n") * 2 && col("b_n") <= col("a_n") * 2)
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"),
        (inter.cast("double") /
          (col("a_n") + col("b_n") - inter).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  private def invertedPath(tok: DataFrame, threshold: Double): DataFrame = {
    val a = tok.select(col("id").as("id_a"), col("block"), col("n").as("na"), col("tok"))
    val b = tok.select(col("id").as("id_b"), col("block"), col("n").as("nb"), col("tok"))
    a.join(b, Seq("block", "tok")).filter(col("id_a") < col("id_b")
        && col("na") <= col("nb") * 2 && col("nb") <= col("na") * 2)
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
