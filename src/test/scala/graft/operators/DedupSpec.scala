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

  test("SimHash golden signatures: exact 64-bit values pinned") {
    // d4 is a rows-only driver check (no DuckDB xxhash64), so the
    // bit-exact gate lives here: any change to tokenization, the hash
    // family, or the bit-sum sign rule moves these longs
    import spark.implicits._
    val fixture = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "pack my box with five dozen liquor jugs"),
      (4L, "sphinx of black quartz judge my vow"),
      (5L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val got = SimHash.signatures(fixture, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    val golden = Map(
      1L -> -7573889167326994222L,
      2L -> -7573326217371541038L,
      3L -> 2495353224988115078L,
      4L -> 4762906711925119524L,
      5L -> -7573889167326994222L)
    assert(got == golden)
  }

  test("SimHash.nearDuplicates returns exact dups at hamming 0") {
    val pairs = SimHash.nearDuplicates(docs, "text", "doc_id", maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0))
  }

  test("MinHashLSH quantified: pairs are a subset of exact pairs, recall >= 0.8") {
    // 15 families x 4 variants: within-family docs share most tokens
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 60).map { i =>
      val fam = i / 4
      val base = (0 until 10).map(j => s"tok${fam}_$j word$j")
      val doc =
        if (i % 4 == 0) base
        else base.updated(rnd.nextInt(10), s"alt${i}_${rnd.nextInt(100)} extra$i")
      (i.toLong, doc.mkString(" "))
    }
    def shingles(t: String, w: Int = 3): Set[Seq[String]] = {
      val toks = t.toLowerCase.split("\\s+").toSeq
      if (toks.length < w) Set(toks) else toks.sliding(w).toSet
    }
    def jac(a: String, b: String): Double = {
      val (sa, sb) = (shingles(a), shingles(b))
      sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
    }
    val threshold = 0.35
    val exact = (for {
      (ia, ta) <- corpus; (ib, tb) <- corpus
      if ia < ib && jac(ta, tb) >= threshold
    } yield (ia, ib)).toSet
    assert(exact.size > 30, s"fixture should have many true pairs, got ${exact.size}")
    // bands=16 (r=2): banding catch probability at j=0.35 is ~0.88 —
    // the right operating point when the threshold sits low on the curve
    val found = MinHashLSH.nearDuplicates(corpus.toDF("doc_id", "text"), "text", "doc_id",
        numHashes = 32, bands = 16, shingleSize = 3, jaccardThreshold = threshold)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // the verify join computes EXACT jaccard on candidates, so no false
    // positives survive; banding may miss pairs → recall is the metric
    assert(found.subsetOf(exact), s"false positives: ${found.diff(exact)}")
    val recall = found.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall below bound (found ${found.size}/${exact.size})")

    // the PORTABLE family (the one the d3 oracle reproduces in SQL)
    // must meet the same quality bar — it changes the hash family, not
    // the min-wise estimator
    val foundP = MinHashLSH.nearDuplicates(corpus.toDF("doc_id", "text"), "text", "doc_id",
        numHashes = 32, bands = 16, shingleSize = 3, jaccardThreshold = threshold,
        portable = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(foundP.subsetOf(exact), s"portable false positives: ${foundP.diff(exact)}")
    val recallP = foundP.intersect(exact).size.toDouble / exact.size
    assert(recallP >= 0.8, s"portable recall $recallP below bound")
  }
}
