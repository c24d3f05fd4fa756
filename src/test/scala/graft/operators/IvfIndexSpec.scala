package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  // 3 tight clusters in 8-dim space, 10 vectors each
  private lazy val corpus = (0L until 30L).map { i =>
    val c = (i % 3).toInt
    val v = Seq.tabulate(8)(j => (if (j == c) 10.0f else 0.0f) + (i.toFloat / 100f))
    (i, v, c)
  }.toDF("vec_id", "embedding", "label")

  test("centroids are deterministic and k-sized") {
    val c1 = IvfIndex.centroids(corpus, k = 3).orderBy("centroid_id").collect()
    val c2 = IvfIndex.centroids(corpus, k = 3).orderBy("centroid_id").collect()
    assert(c1.length == 3)
    assert(c1.map(_.toString).toSeq == c2.map(_.toString).toSeq)
  }

  test("search finds same-cluster neighbors with high recall") {
    val got = IvfIndex.search(corpus.filter($"vec_id" < 3), corpus,
      k = 3, numCells = 3, nprobe = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    // with nprobe=1 on well-separated clusters, every neighbor shares
    // the query's cluster (i % 3)
    got.foreach { case (q, n) => assert(q % 3 == n % 3, s"query $q got cross-cluster $n") }
    val byQuery = got.groupBy(_._1)
    assert(byQuery.values.forall(_.length == 3), "full top-3 per query")
  }

  test("IVF quantified: recall@5 vs exact kNN >= 0.8 on clustered corpus") {
    val emb = VectorFixtures.clustered.toDF("vec_id", "embedding", "label")
    val queries = emb.filter($"vec_id" < 8L)
    val exact = VectorFixtures.groupNeighbors(
      VectorOps.knnBrute(queries, emb, k = 5))
    val approx = VectorFixtures.groupNeighbors(
      IvfIndex.search(queries, emb, k = 5, numCells = 8, nprobe = 2))
    val recall = VectorFixtures.recall(exact, approx)
    assert(recall >= 0.8, s"IVF recall@5 = $recall")
  }

  test("ivfpqSearch: recall@5 >= 0.8; returned cosines exact; deterministic") {
    val emb = VectorFixtures.clustered.toDF("vec_id", "embedding", "label")
    val queries = emb.filter($"vec_id" < 8L)
    def run() = IvfIndex.ivfpqSearch(queries, emb, k = 5,
      numCells = 8, nprobe = 2, m = 8, codebookK = 8, refine = 4)
    val r1 = run().select("query_id", "neighbor_id", "rnk", "cosine")
      .as[(Long, Long, Int, Double)].collect().toSet
    // recall vs exact kNN despite the 4-byte-code ADC shortlist
    val exact = VectorFixtures.groupNeighbors(VectorOps.knnBrute(queries, emb, k = 5))
    val recall = VectorFixtures.recall(exact, r1.groupBy(_._1).map {
      case (q, rows) => q -> rows.map(_._2).toSet
    })
    assert(recall >= 0.8, s"IVF-PQ recall@5 = $recall")
    // the re-rank is exact: every returned cosine equals brute force's
    val brute = VectorOps.knnBrute(queries, emb, k = 1000)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
      .map { case (q, n, c) => (q, n) -> c }.toMap
    r1.foreach { case (q, n, _, c) =>
      assert(brute((q, n)) == c, s"cosine for ($q,$n) not exact") }
    // deterministic under re-execution
    val r2 = run().select("query_id", "neighbor_id", "rnk", "cosine")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(r1 == r2)
  }

  test("semanticNearDup: zero false positives, recall >= 0.8 vs exact pairs") {
    val emb = VectorFixtures.clustered.toDF("vec_id", "embedding", "label")
    val e = emb.select($"vec_id", VectorOps.toDouble($"embedding").as("emb"))
    val a = e.select($"vec_id".as("id_a"), $"emb".as("emb_a"))
    val b = e.select($"vec_id".as("id_b"), $"emb".as("emb_b"))
    val exact = a.crossJoin(b).filter($"id_a" < $"id_b")
      .select($"id_a", $"id_b", VectorOps.cosine($"emb_a", $"emb_b").as("cos"))
      .filter($"cos" >= 0.9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val found = IvfIndex.semanticNearDup(emb, tau = 0.9, numCells = 8)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(found.subsetOf(exact), s"false positives: ${found.diff(exact).take(5)}")
    val recall = found.size.toDouble / exact.size
    assert(recall >= 0.8, s"semantic dedup recall = $recall")
  }

  test("productQuantize: deterministic codes in [0,k), recon beats global mean") {
    val emb = VectorFixtures.clustered.toDF("vec_id", "embedding", "label")
    val m = 4
    val k = 8
    val r1 = IvfIndex.productQuantize(emb, m = m, k = k).orderBy("vec_id").collect()
    val r2 = IvfIndex.productQuantize(emb, m = m, k = k).orderBy("vec_id").collect()
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq, "non-deterministic")
    assert(r1.length == 128)
    (0 until m).foreach { s =>
      val codes = r1.map(_.getInt(1 + s))
      assert(codes.forall(c => c >= 0 && c < k), s"code_$s out of range")
      assert(codes.distinct.length > 1, s"code_$s degenerate (single code)")
    }
    // reconstruction must beat the one-centroid baseline (global mean)
    val e = emb.select(VectorOps.toDouble($"embedding").as("emb"))
    val dim = 16
    val mean = e.select(posexplode($"emb").as(Seq("pos", "v")))
      .groupBy("pos").agg(avg($"v").as("mu")).orderBy("pos")
      .collect().map(_.getDouble(1))
    val baseline = e.as[Seq[Double]].collect()
      .map(v => v.zip(mean).map { case (x, mu) => (x - mu) * (x - mu) }.sum / dim)
    val avgBaseline = baseline.sum / baseline.length
    val avgRecon = r1.map(_.getDouble(1 + m)).sum / r1.length
    assert(avgRecon < avgBaseline,
      s"PQ recon $avgRecon should beat global-mean baseline $avgBaseline")
  }
}
