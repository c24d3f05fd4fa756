package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation of the SAME fixed-point recurrence —
    * any engine following it must agree exactly (integer arithmetic).
    */
  private def reference(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r: Map[Long, Long] = deg.map { case (k, _) => k -> PageRank.Unit }
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => BigInt(r(u) / deg(u)) }.sum
      }
      r = r.map { case (v, _) =>
        v -> (150000000L + (in.getOrElse(v, BigInt(0)) / 20).toLong * 17L)
      }
    }
    r
  }

  private def run(pairs: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.ranks(spark, pairs.toDF("id_a", "id_b"), iters)
      .as[(Long, Long)].collect().toMap

  test("matches the fixed-point reference recurrence exactly") {
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (3L, 6L))
    assert(run(pairs, 5) == reference(pairs, 5))
  }

  test("rank mass is conserved (~node count) and hubs outrank leaves") {
    val star = (2L to 9L).map(i => (1L, i)) // node 1 is the hub
    val r = run(star, 5)
    assert(math.abs(r.values.sum.toDouble / PageRank.Unit - r.size) < 1e-3)
    assert(r(1L) > r(2L))
    assert((2L to 9L).map(r).toSet.size == 1) // leaves symmetric
  }

  test("empty graph yields empty ranks") {
    val empty = spark.emptyDataset[(Long, Long)].toDF("id_a", "id_b")
    assert(PageRank.ranks(spark, empty, 3).count() == 0)
  }
}
