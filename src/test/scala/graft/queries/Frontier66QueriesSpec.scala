package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the sixty-sixth frontier batch. */
class Frontier66QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a125 DiD: cells partition user-days; estimate matches float reference") {
    val r = run("a125_diff_in_diff").collect()(0)
    val ns = (0 to 3).map(r.getLong)
    val userDays = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id"), col("ts").cast("date")).distinct().count()
    assert(ns.sum == userDays)
    val means = (4 to 7).map(i => r.getLong(i) / 1e6)
    val didRef = (means(0) - means(1)) - (means(2) - means(3))
    val did = r.getLong(8) / 1e6
    // micro-floor rounding on each mean is at most 4e-6 total
    assert(math.abs(did - didRef) < 0.01, s"$did vs $didRef")
  }

  test("v37 mutual kNN: symmetry and the reciprocity property hold") {
    val rows = run("v37_mutual_knn").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
    // driver-side exact recomputation: same left-fold cosine, same
    // (cosine desc, id) rank-with-ties top-5, then mutuality
    val vecs = graft.Tables.embeddings(spark, sf("sf0.01"))
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val nrm = vecs.map { case (id, v) => id -> math.sqrt(dot(v, v)) }.toMap
    val top = vecs.map { case (q, qv) =>
      val scored = vecs.filter(_._1 != q).map { case (n, nv) =>
        (n, dot(qv, nv) / (nrm(q) * nrm(n)))
      }.sortBy { case (n, c) => (-c, n) }
      // rank-with-ties semantics: keep everything tied with position 5
      val cut = scored(4)._2
      q -> scored.takeWhile { case (_, c) => c >= cut }.map(_._1).toSet
    }.toMap
    // .toSeq first: flatMap on a Map yielding tuples would rebuild a
    // Map and silently collapse each query to a single pair
    val expected = top.toSeq.flatMap { case (q, s) =>
      s.toSeq.filter(n => q < n && top(n).contains(q)).map(n => (q, n))
    }.toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
  }

  test("u49 IVM distinct: maintained view equals full recompute") {
    val rows = run("u49_ivm_distinct").collect()
    val ref = graft.Tables.events(spark, sf("sf0.01"))
      .groupBy(col("ts").cast("date").as("day"))
      .agg(count_distinct(col("user_id")).as("d"), count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.length == ref.size)
    rows.foreach { r =>
      val (d, n) = ref(r.getDate(0).toString)
      assert(r.getLong(1) == d && r.getLong(2) == n)
    }
  }
}
