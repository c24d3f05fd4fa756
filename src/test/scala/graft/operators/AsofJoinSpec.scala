package graft.operators

import graft.SparkSpec

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asofLeft picks most recent right row at-or-before; null when none") {
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 5L, "e0"), (2L, 10L, "e3"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 10L, "r@10"), (1L, 15L, "r@15"), (3L, 1L, "r-other"))
      .toDF("rk", "rt", "val")
    val got = AsofJoin.asofLeft(left, right, "k", "t", "rk", "rt", Seq("val"))
      .select("ev", "val").as[(String, Option[String])].collect().toMap
    assert(got("e0").isEmpty)          // before any right row
    assert(got("e1").contains("r@10")) // exact-time tie matches (>=)
    assert(got("e2").contains("r@15")) // most recent wins
    assert(got("e3").isEmpty)          // key with no right rows
  }

  test("asofForward picks earliest right row at-or-after; null when none") {
    val left = Seq((1L, 10L, "e1"), (1L, 20L, "e2"), (1L, 12L, "e0"), (2L, 10L, "e3"))
      .toDF("k", "t", "ev")
    val right = Seq((1L, 10L, "r@10"), (1L, 15L, "r@15"), (3L, 1L, "r-other"))
      .toDF("rk", "rt", "val")
    val got = AsofJoin.asofForward(left, right, "k", "t", "rk", "rt", Seq("val"))
      .select("ev", "val").as[(String, Option[String])].collect().toMap
    assert(got("e1").contains("r@10")) // exact-time tie matches (<=)
    assert(got("e0").contains("r@15")) // earliest at-or-after wins
    assert(got("e2").isEmpty)          // after the last right row
    assert(got("e3").isEmpty)          // key with no right rows
  }

  test("matched right row's NULL payload field stays NULL; fields never mix rows") {
    val left = Seq((1L, 30L, "e1")).toDF("k", "t", "ev")
    val right = Seq(
      (1L, 10L, Some("old-a"), Some("old-b")),
      (1L, 20L, None, Some("new-b"))) // the match: a is legitimately NULL
      .toDF("rk", "rt", "a", "b")
    val got = AsofJoin.asofLeft(left, right, "k", "t", "rk", "rt", Seq("a", "b"))
      .select("a", "b").as[(Option[String], Option[String])].head()
    // SQL ASOF semantics: the matched row as-is — NOT (old-a, new-b)
    assert(got == (None, Some("new-b")))
  }
}
