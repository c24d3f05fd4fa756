package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the sixty-fourth frontier batch. */
class Frontier64QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a123 V-optimal: cuts ordered; cost matches a brute-force DP") {
    val r = run("a123_voptimal_histogram").collect()(0)
    val (c1, c2, c3, sse) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(0 < c1 && c1 < c2 && c2 < c3 && c3 < 31)
    // brute-force reference over all cut triples
    val daily = graft.Tables.events(spark, sf("sf0.01"))
      .groupBy(dayofmonth(col("ts").cast("date")).as("i"))
      .agg(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"))
      .orderBy(col("i")).collect().map(_.getLong(1))
    val n = daily.length
    val ps = daily.scanLeft(0L)(_ + _)
    val pss = daily.map(x => x * x).scanLeft(0L)(_ + _)
    def sse0(a: Int, b: Int): Long = // days a+1..b
      (pss(b) - pss(a)) - {
        val s = ps(b) - ps(a); (s * s) / (b - a)
      }
    var best = Long.MaxValue
    var bestCuts = (0, 0, 0)
    for (i <- 1 until n; j <- i + 1 until n; k <- j + 1 until n) {
      val c = sse0(0, i) + sse0(i, j) + sse0(j, k) + sse0(k, n)
      if (c < best) { best = c; bestCuts = (i, j, k) }
    }
    assert(sse == best, s"cost $sse vs brute $best")
    assert((c1.toInt, c2.toInt, c3.toInt) == bestCuts ||
      sse0(0, c1.toInt) + sse0(c1.toInt, c2.toInt) +
        sse0(c2.toInt, c3.toInt) + sse0(c3.toInt, n) == best,
      "cuts achieve the optimal cost")
  }

  test("d13 sign LSH: pairs verified, symmetric-free, hamming from raw signs") {
    val rows = run("d13_sign_lsh_neardup").collect()
    assert(rows.nonEmpty)
    val sigs = graft.Tables.embeddings(spark, sf("sf0.01"))
      .select(col("vec_id"),
        expr("""aggregate(transform(sequence(1, 48),
            i -> IF(cast(element_at(embedding, i) as double) >= 0,
                    shiftleft(cast(1 as bigint), i - 1), cast(0 as bigint))),
          cast(0 as bigint), (a, b) -> a + b)""").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b, h) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(a < b)
      assert(java.lang.Long.bitCount(sigs(a) ^ sigs(b)) == h)
      assert(h <= 16)
      // banding guarantee: some 6-bit band agrees
      assert((0 until 8).exists(k =>
        ((sigs(a) >> (k * 6)) & 63) == ((sigs(b) >> (k * 6)) & 63)))
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
  }

  test("q24 bag ops: multiplicities obey min/difference identities") {
    val rows = run("q24_bag_set_ops").collect()
    val li = graft.Tables.lineitem(spark, sf("sf0.01"))
    val hi = li.filter(col("l_extendedprice") > 30000)
      .groupBy(col("l_partkey")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lo = li.filter(col("l_quantity") <= 10)
      .groupBy(col("l_partkey")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val both = rows.filter(_.getString(1) == "both")
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val hiOnly = rows.filter(_.getString(1) == "hi_only")
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    hi.keys.foreach { k =>
      val h = hi(k); val l = lo.getOrElse(k, 0L)
      val expBoth = math.min(h, l)
      val expHi = math.max(0L, h - l)
      assert(both.getOrElse(k, 0L) == expBoth, s"intersect all for part $k")
      assert(hiOnly.getOrElse(k, 0L) == expHi, s"except all for part $k")
    }
  }
}
