package graft.operators

import graft.SparkSpec

class JaccardJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "a b c d"),
    (2L, "en", "a b c e"),    // jaccard 3/5 = 0.6 with 1
    (3L, "en", "x y z w v"),  // unrelated
    (4L, "en", "a b c d"),    // exact dup of 1
    (5L, "fr", "a b c d")     // other block — must not pair
  ).toDF("doc_id", "lang", "text")

  private def run(limit: Int) =
    JaccardJoin.pairs(docs, "doc_id", "lang", "text", threshold = 0.5, vocabLimit = limit)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet

  test("bitmap path: exact pairs, block-scoped, exact jaccard values") {
    val got = run(limit = 4096) // 9 distinct tokens → bitmap path
    assert(got == Set((1L, 2L, 0.6), (1L, 4L, 1.0), (2L, 4L, 0.6)))
  }

  test("inverted-index path returns the identical result set") {
    val got = run(limit = 3) // 9 distinct tokens > 3 → forced inverted path
    assert(got == run(limit = 4096))
  }

  test("single-block corpus: prefix-filtered candidates still find every pair") {
    // the scale scenario VERDICT flagged: block key with ONE value —
    // candidate generation must come from rare-token prefixes, and the
    // result must still match a brute-force all-pairs computation
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 60).map { i =>
      val base = (0 until 12).map(j => s"w${(i / 6) * 12 + j}")  // 10 families
      val mutated =
        if (i % 6 == 0) base
        else base.updated(rnd.nextInt(12), s"u${i}_${rnd.nextInt(1000)}")
      (i.toLong, "en", rnd.shuffle(mutated).mkString(" "))
    }
    val docs = corpus.toDF("doc_id", "lang", "text")
    def jac(a: String, b: String): Double = {
      val (sa, sb) = (a.split(" ").toSet, b.split(" ").toSet)
      sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
    }
    val expect = (for {
      (ia, _, ta) <- corpus; (ib, _, tb) <- corpus
      if ia < ib && jac(ta, tb) >= 0.5
    } yield (ia, ib, jac(ta, tb))).toSet
    for (limit <- Seq(4096, 3)) { // bitmap verify and array verify
      val got = JaccardJoin.pairs(docs, "doc_id", "lang", "text", 0.5, vocabLimit = limit)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(got == expect, s"vocabLimit=$limit")
    }
  }

  test("pair EXACTLY at the threshold is included by both paths (>= rule, ceil bound keeps it)") {
    // |A∩B| = 7, |A∪B| = 10 → jaccard = 0.7 exactly. Two boundary
    // hazards pinned at once: (1) the final filter is INCLUSIVE
    // (jaccard >= t, matching the d2 oracle's >=) — a strict > would
    // silently drop every exactly-at-threshold pair; (2) the size
    // pre-filter's ceil(n·t) bounds sit exactly on the pair: sizes
    // (10, 7) need 7 >= ceil(10·0.7) = 7 — any off-by-one (e.g. a
    // floor(n·t)+1 formulation, = 8 here) prunes the legitimate pair
    // before the verify stage ever sees it.
    val a = (1 to 7).map(i => s"c$i") ++ Seq("a1", "a2", "a3") // 10 tokens
    val b = (1 to 7).map(i => s"c$i")                         // 7 tokens ⊂ a
    val docs2 = Seq((1L, "en", a.mkString(" ")), (2L, "en", b.mkString(" ")))
      .toDF("doc_id", "lang", "text")
    for (limit <- Seq(4096, 3)) {
      val got = JaccardJoin.pairs(docs2, "doc_id", "lang", "text",
        threshold = 0.7, vocabLimit = limit)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(got == Set((1L, 2L, 0.7)), s"vocabLimit=$limit got=$got")
    }
    // one token fewer on b (6/10 = 0.6 < 0.7) must be excluded
    val docs3 = Seq((1L, "en", a.mkString(" ")),
      (2L, "en", (1 to 6).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    for (limit <- Seq(4096, 3)) {
      val got = JaccardJoin.pairs(docs3, "doc_id", "lang", "text",
        threshold = 0.7, vocabLimit = limit).collect()
      assert(got.isEmpty, s"vocabLimit=$limit got=${got.toSeq}")
    }
  }

  test("containment: directional, subset docs detected, both paths exact") {
    val cdocs = Seq(
      (1L, "en", "a b c d"),
      (2L, "en", "a b c e"),   // cont(1→2)=cont(2→1)=0.75
      (3L, "en", "a b"),       // cont(3→1)=cont(3→2)=1.0; reverse 0.5
      (4L, "fr", "a b c d")    // other block — must not pair
    ).toDF("doc_id", "lang", "text")
    val expect = Set(
      (1L, 2L, 0.75), (2L, 1L, 0.75),
      (3L, 1L, 1.0), (3L, 2L, 1.0))
    for (limit <- Seq(4096, 3)) {
      val got = JaccardJoin.containmentPairs(cdocs, "doc_id", "lang", "text",
          threshold = 0.75, vocabLimit = limit)
        .select("id_a", "id_b", "containment").as[(Long, Long, Double)].collect().toSet
      assert(got == expect, s"vocabLimit=$limit")
    }
  }

  test("containment: both paths match brute force on a random corpus") {
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 50).map { i =>
      val fam = i / 5
      val words = (0 until 6 + rnd.nextInt(6)).map(_ => s"w${fam * 8 + rnd.nextInt(10)}")
      (i.toLong, "en", words.mkString(" "))
    }
    val docs = corpus.toDF("doc_id", "lang", "text")
    def cont(a: String, b: String): Double = {
      val (sa, sb) = (a.split(" ").toSet, b.split(" ").toSet)
      sa.intersect(sb).size.toDouble / sa.size.toDouble
    }
    val expect = (for {
      (ia, _, ta) <- corpus; (ib, _, tb) <- corpus
      if ia != ib && cont(ta, tb) >= 0.8
    } yield (ia, ib, cont(ta, tb))).toSet
    for (limit <- Seq(4096, 3)) {
      val got = JaccardJoin.containmentPairs(docs, "doc_id", "lang", "text", 0.8,
          vocabLimit = limit)
        .select("id_a", "id_b", "containment").as[(Long, Long, Double)].collect().toSet
      assert(got == expect, s"vocabLimit=$limit")
    }
  }

  test("pairsOfSets over hashed 3-gram shingles matches brute force, both paths") {
    import graft.functions.TextFunctions
    import org.apache.spark.sql.functions.col
    // word order matters for shingles: doc 2 is a reshuffle of doc 0's
    // tokens — token-set Jaccard would call them identical, the 3-gram
    // join must not
    val rnd = new scala.util.Random(13)
    val corpus = (0 until 40).map { i =>
      val base = (0 until 10).map(j => s"w${(i / 4) * 3 + j}")
      val words =
        if (i % 4 == 0) base
        else if (i % 4 == 1) base.updated(rnd.nextInt(10), s"u$i")
        else if (i % 4 == 2) rnd.shuffle(base)
        else (0 until 10).map(_ => s"r${rnd.nextInt(1000)}")
      (i.toLong, "en", words.mkString(" "))
    }
    val docs = corpus.toDF("doc_id", "lang", "text")
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ").toSeq
      if (toks.size >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    def jac(a: String, b: String): Double = {
      val (sa, sb) = (shingles(a), shingles(b))
      sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
    }
    val expect = (for {
      (ia, _, ta) <- corpus; (ib, _, tb) <- corpus
      if ia < ib && jac(ta, tb) >= 0.5
    } yield (ia, ib, jac(ta, tb))).toSet
    assert(expect.nonEmpty)
    for (limit <- Seq(4096, 1)) { // bitmap and forced-prefix paths
      val got = JaccardJoin.pairsOfSets(docs, "doc_id", "lang",
          TextFunctions.shingleHashes(TextFunctions.tokens(col("text")), 3),
          threshold = 0.5, vocabLimit = limit)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(got == expect, s"vocabLimit=$limit")
    }
  }

  test("multi-word bitmap: vocab spanning >64 tokens still exact") {
    val wide = (0 until 3).map { i =>
      // 70-token docs over a 140-token vocabulary; doc 0 and 2 identical
      val base = (0 until 70).map(j => s"t${(j + i * 35) % 140}").mkString(" ")
      (i.toLong, "en", if (i == 2) (0 until 70).map(j => s"t$j").mkString(" ") else base)
    }.toDF("doc_id", "lang", "text")
    val got = JaccardJoin.pairs(wide, "doc_id", "lang", "text", 0.9, vocabLimit = 4096)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(got == Set((0L, 2L, 1.0)))
  }
}
