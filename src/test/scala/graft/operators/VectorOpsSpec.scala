package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dot and l2Norm match driver-side math") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
    val (dot, norm) = df.select(
      VectorOps.dot($"a", $"b"), VectorOps.l2Norm($"a")).as[(Double, Double)].head()
    assert(dot == 32.0)
    assert(math.abs(norm - math.sqrt(14.0)) < 1e-12)
  }

  test("cosine of identical vectors is ~1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
    val got = df.select(VectorOps.cosine($"a", $"b")).as[Double].collect().toSeq
    assert(math.abs(got.head - 1.0) < 1e-12)
    assert(got(1) == 0.0)
  }

  test("knnBrute returns k nearest by cosine, excluding self") {
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f), "a"),
      (1L, Seq(0.9f, 0.1f), "a"),
      (2L, Seq(0.0f, 1.0f), "a"),
      (3L, Seq(1.0f, 0.05f), "a")).toDF("vec_id", "embedding", "label")
    val got = VectorOps.knnBrute(emb.filter($"vec_id" === 0L), emb, k = 2)
      .orderBy($"rnk").select("neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(3L, 1L)) // 3 is closest to (1,0), then 1; 2 orthogonal
  }

  test("annLsh buckets identical vectors together and finds them") {
    val emb = (0L until 20L).map { i =>
      val v = Seq.tabulate(64)(j => if (j == (i % 4).toInt) 1.0f else 0.01f * j)
      (i, v, "x")
    }.toDF("vec_id", "embedding", "label")
    val got = VectorOps.annLsh(emb.filter($"vec_id" === 0L), emb, k = 3)
    // vectors 4, 8, 12, 16 are identical to 0 → same bucket, cosine 1
    val ids = got.select("neighbor_id").as[Long].collect().toSet
    assert(ids.subsetOf(Set(4L, 8L, 12L, 16L)) && ids.nonEmpty)
  }

  test("makePlanes is deterministic for a fixed seed") {
    assert(VectorOps.makePlanes(4, 8) == VectorOps.makePlanes(4, 8))
  }

  test("annLsh quantified: recall@5 vs exact kNN >= 0.6 on clustered corpus") {
    val emb = VectorFixtures.clustered.toDF("vec_id", "embedding", "label")
    val queries = emb.filter($"vec_id" < 8L)
    val exact = VectorFixtures.groupNeighbors(
      VectorOps.knnBrute(queries, emb, k = 5))
    val approx = VectorFixtures.groupNeighbors(
      VectorOps.annLsh(queries, emb, k = 5))
    val recall = VectorFixtures.recall(exact, approx)
    assert(recall >= 0.6, s"annLsh recall@5 = $recall")
  }
}

/** Shared deterministic clustered corpus + recall math for ANN specs. */
object VectorFixtures {
  /** 8 well-separated clusters x 16 members in 16-dim space. */
  lazy val clustered: Seq[(Long, Seq[Float], String)] = {
    val rnd = new scala.util.Random(5)
    (0L until 128L).map { i =>
      val c = (i % 8).toInt
      val v = Seq.tabulate(16)(j =>
        (if (j == c * 2) 8.0f else 0.0f) + rnd.nextFloat() * 0.5f)
      (i, v, s"c$c")
    }
  }

  def groupNeighbors(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  /** Mean per-query |approx ∩ exact| / |exact| (queries the approx
    * method returned nothing for count as zero recall).
    */
  def recall(exact: Map[Long, Set[Long]], approx: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, e) =>
      approx.getOrElse(q, Set.empty).intersect(e).size.toDouble / e.size
    }
    per.sum / per.size
  }
}
