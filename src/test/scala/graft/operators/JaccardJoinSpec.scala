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
