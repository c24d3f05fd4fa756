package graft.operators

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "completely different text about spark engines here"),
    (4L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (5L, "unrelated short doc")
  ).toDF("doc_id", "text")

  test("MinHashLSH finds exact and near duplicates, not unrelated pairs") {
    val pairs = MinHashLSH.nearDuplicates(docs, "text", "doc_id",
      numHashes = 32, bands = 16, shingleSize = 3, jaccardThreshold = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L)), "exact dup must be found")
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L)), "near dup should bucket together")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("MinHashLSH exact-dup pair has jaccard 1.0") {
    val j = MinHashLSH.nearDuplicates(docs, "text", "doc_id",
      numHashes = 32, bands = 16, shingleSize = 3, jaccardThreshold = 0.3)
      .filter($"id_a" === 1L && $"id_b" === 4L)
      .select("jaccard").as[Double].head()
    assert(j == 1.0)
  }

  test("SimHash: identical docs share signature; near-dups are close in hamming") {
    val sigs = SimHash.signatures(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(sigs(1L) == sigs(4L), "identical text must hash identically")
    val hammingNear = java.lang.Long.bitCount(sigs(1L) ^ sigs(2L))
    val hammingFar = java.lang.Long.bitCount(sigs(1L) ^ sigs(3L))
    assert(hammingNear < hammingFar, s"near-dup hamming $hammingNear should be < unrelated $hammingFar")
  }

  test("SimHash.nearDuplicates returns exact dups at hamming 0") {
    val pairs = SimHash.nearDuplicates(docs, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0))
  }
}
