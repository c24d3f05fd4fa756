package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the thirty-third frontier batch. */
class Frontier33QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("v24 hamming codes: distances in [0,64], 5 ranked rows per query, ranks ordered") {
    val rows = run("v24_binary_hamming").collect()
    assert(rows.length == 50)
    assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= 64))
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.values.foreach { g =>
      val sorted = g.sortBy(_.getInt(3))
      assert(sorted.map(_.getInt(3)).toSeq == (1 to 5))
      // hamming must be non-decreasing in rank
      assert(sorted.map(_.getInt(2)).toSeq == sorted.map(_.getInt(2)).sorted.toSeq)
    }
  }

  test("v24 top-1 hamming matches a brute-force sign-bit recomputation for query 0") {
    val emb = graft.Tables.embeddings(spark, sf("sf0.01"))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_ >= 0f).toArray).toMap
    val q = emb(0L)
    val best = emb.filter(_._1 >= 10).map { case (id, bits) =>
      (id, bits.zip(q).count { case (a, b) => a != b })
    }.minBy { case (id, h) => (h, id) }
    val top1 = run("v24_binary_hamming").filter(col("query_id") === 0 && col("rn") === 1)
      .collect()(0)
    assert((top1.getLong(1), top1.getInt(2)) == best)
  }

  test("a83 Theil-Sen: pair count is C(days,2); slope is finite") {
    val r = run("a83_theil_sen").collect()(0)
    val days = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("ts").cast("date")).distinct().count()
    assert(r.getLong(0) == days * (days - 1) / 2)
    assert(!r.getDouble(1).isNaN && !r.getDouble(1).isInfinite)
  }

  test("t46 Heaps fit: beta in (0,1] and the fit interpolates a sane vocab size") {
    val r = run("t46_heaps_law").collect()(0)
    val (n, beta, lnK) = (r.getLong(0), r.getDouble(1), r.getDouble(2))
    assert(n >= 10, s"expected >= 10 checkpoints, got $n")
    // The synthetic corpus has a CLOSED ~31-term vocabulary, so growth
    // saturates in bucket 0 and beta is exactly 0; open corpora give
    // the classic 0 < beta < 1. Assert the valid range inclusive.
    assert(beta >= 0.0 && beta <= 1.0, s"Heaps beta out of range: $beta")
    // predicted vocab at the full corpus should be within 2x of actual
    val docs = graft.Tables.documents(spark, sf("sf0.01"))
    val toks = docs.select(explode(
      expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).as("t"))
    val nTok = toks.count().toDouble
    val vocab = toks.distinct().count().toDouble
    val predicted = math.exp(lnK) * math.pow(nTok, beta)
    assert(predicted > vocab / 2 && predicted < vocab * 2,
      s"Heaps prediction $predicted vs actual vocab $vocab")
  }

  test("ev57 Markov predictor: accuracy in (0,1], argmax beats uniform baseline") {
    val rows = run("ev57_markov_predict").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val acc = r.getDouble(4)
      assert(acc > 0.0 && acc <= 1.0)
      assert(r.getLong(3) <= r.getLong(2)) // n_correct <= n_total
      // argmax of k classes is always >= 1/k of the mass
      assert(acc >= 1.0 / rows.length - 1e-9)
    }
  }

  test("a85 Brown-Forsythe: W is non-negative and groups cover the event types") {
    val r = run("a85_brown_forsythe").collect()(0)
    assert(r.getInt(0) == 5) // event types in the corpus
    assert(r.getLong(1) == graft.Tables.events(spark, sf("sf0.01")).count())
    assert(r.getDouble(2) >= 0.0)
  }
}
