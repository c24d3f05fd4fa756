package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the sixty-third frontier batch. */
class Frontier63QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a122 Cochran Q: statistic matches a driver-side exact recompute") {
    val r = run("a122_cochran_q").collect()(0)
    val (nU, c0, c1, c2, c3) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))
    // recompute from raw data with plain Scala
    val uw = graft.Tables.events(spark, sf("sf0.01"))
      .filter(dayofmonth(col("ts").cast("date")) <= 28)
      .select(col("user_id"),
        expr("(day(cast(ts as date)) - 1) div 7").as("wk"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("c"))
      .groupBy("user_id", "wk").agg(max(col("c")).as("conv")).collect()
    val byUser = uw.groupBy(_.getLong(0))
    assert(nU == byUser.size)
    val cols = Array(c0, c1, c2, c3)
    (0 to 3).foreach { w =>
      val cw = uw.filter(r2 => r2.getLong(1) == w && r2.getLong(2) == 1).length
      assert(cols(w) == cw, s"week $w column total")
    }
    val n = cols.sum
    val sc2 = cols.map(c => c * c).sum
    val sr2 = byUser.values.map(g => { val s = g.map(_.getLong(2)).sum; s * s }).sum
    if (4 * n - sr2 > 0) {
      val qRef = (BigInt(3) * (4 * sc2 - n * n) * 1000000) / (4 * n - sr2)
      assert(r.getLong(5) == qRef.toLong)
      assert((r.getInt(6) == 1) == (qRef > 7814728))
    } else assert(r.isNullAt(5))
  }

  test("v35 medoids: the reported cost is minimal within its label") {
    val rows = run("v35_label_medoids").collect()
    assert(rows.length == 10)
    // brute-force check on one label at spec scale (sf0.001)
    val small = run("v35_label_medoids", sf("sf0.001")).collect()
    val vecs = graft.Tables.embeddings(spark, sf("sf0.001"))
      .select(col("vec_id"), col("label"),
        expr("transform(embedding, v -> cast(floor(cast(v as double) * 1000) as bigint))")
          .as("q")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Long](2).toArray))
    val byLabel = vecs.groupBy(_._2)
    small.foreach { r =>
      val (label, medoid, cost) = (r.getInt(0), r.getLong(1), r.getLong(2))
      val members = byLabel(label)
      def costOf(x: Array[Long]): Long =
        members.map { case (_, _, y) =>
          x.zip(y).map { case (a, b) => (a - b) * (a - b) }.sum
        }.sum
      val costs = members.map { case (id, _, v) => id -> costOf(v) }
      val best = costs.minBy { case (id, c) => (c, id) }
      assert(best._1 == medoid && best._2 == cost, s"label $label")
    }
  }

  test("t60 KWIC: every hit is a real occurrence with a correct window") {
    val rows = run("t60_kwic").collect()
    assert(rows.nonEmpty)
    val toks = graft.Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("t")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toArray).toMap
    rows.take(100).foreach { r =>
      val (doc, pos, ctx) = (r.getLong(0), r.getInt(1), r.getString(2))
      val t = toks(doc)
      assert(t(pos - 1) == "spark")
      val lo = math.max(1, pos - 2) - 1
      val hi = math.min(t.length, pos + 2)
      assert(ctx == t.slice(lo, hi).mkString(" "))
    }
    // hit count equals the corpus frequency of the term
    val freq = toks.values.map(_.count(_ == "spark")).sum
    assert(rows.length == freq)
  }
}
