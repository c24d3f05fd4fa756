package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** 64-bit SimHash signatures + banded near-duplicate pairs.
  *
  * simhash bit i = sign( Σ_tokens count(token) * (±1 by bit i of
  * xxhash64(token)) ). Computed with one explode + one groupBy — the
  * 64 bit-sums are a single wide aggregate (partial+final map-side
  * combine), so the shuffle carries one row per (doc, token) and then
  * one row per doc. Near-dup candidate blocking uses 4 bands of 16
  * bits (any pair with hamming distance <= 3 shares at least one band
  * by pigeonhole over 64/16).
  */
object SimHash {
  private val Bits = 64
  private val BandBits = 16
  private val NumBands = Bits / BandBits

  /** (id, simhash) — one 64-bit signature per document. */
  def signatures(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val tokenCounts = docs
      .select(col(idCol).as("id"), explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("id"), col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("th", xxhash64(col("token")))

    val bitSums: Seq[Column] = (0 until Bits).map { i =>
      sum(when(shiftright(col("th"), i).bitwiseAND(lit(1L)) === 1L, col("cnt"))
        .otherwise(-col("cnt"))).as(s"b$i")
    }
    val agged = tokenCounts.groupBy(col("id")).agg(bitSums.head, bitSums.tail: _*)

    val sig: Column = (0 until Bits).map { i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
    agged.select(col("id"), sig.as("simhash"))
  }

  /** Pairs (id_a < id_b) with hamming(simhash_a, simhash_b) <= maxHamming,
    * blocked by 16-bit bands.
    */
  def nearDuplicates(docs: DataFrame, textCol: String, idCol: String,
                     maxHamming: Int = 3): DataFrame = {
    val sigs = signatures(docs, textCol, idCol)
    val banded = sigs.select(
      col("id"), col("simhash"),
      posexplode(array((0 until NumBands).map { b =>
        shiftright(col("simhash"), b * BandBits).bitwiseAND(lit(0xFFFFL))
      }: _*)).as(Seq("band_id", "band_val")))

    val l = banded.select(col("id").as("id_a"), col("simhash").as("sig_a"), col("band_id"), col("band_val"))
    val r = banded.select(col("id").as("id_b"), col("simhash").as("sig_b"), col("band_id"), col("band_val"))
    l.join(r, Seq("band_id", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
