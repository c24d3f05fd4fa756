package graft.operators

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 10L, "p10"), (1L, 99L, "p99"), (1L, 100L, "p100"),
    (1L, 250L, "p250"), (2L, 10L, "q10"), (1L, -5L, "pneg"))
    .toDF("k", "x", "pname")

  private lazy val intervals = Seq(
    (1L, 10L, 100L, "ivA"),    // [10,100): catches p10, p99; NOT p100
    (1L, 90L, 260L, "ivB"),    // spans 3 buckets of width 100
    (1L, 50L, 50L, "ivEmpty"), // empty — matches nothing
    (1L, 60L, 40L, "ivInv"),   // inverted — matches nothing
    (2L, 0L, 20L, "ivOther"),  // other key: only q10
    (1L, -100L, 0L, "ivNeg"))  // negative domain: catches pneg
    .toDF("k", "lo", "hi", "ivname")

  test("bucketized range join == exact range semantics (hi exclusive, keys scoped)") {
    for (w <- Seq(7L, 100L, 1000L)) { // answer must not depend on bucket width
      val got = RangeJoin.pointInInterval(points, intervals, Seq("k"), "x", "lo", "hi", w)
        .select("pname", "ivname").as[(String, String)].collect().toSet
      assert(got == Set(
        ("p10", "ivA"), ("p99", "ivA"),
        ("p99", "ivB"), ("p100", "ivB"), ("p250", "ivB"),
        ("q10", "ivOther"),
        ("pneg", "ivNeg")), s"width=$w")
    }
  }

  test("exact buckets beyond 2^53 (nanosecond-timestamp domain)") {
    // double-precision division would round these; div must not
    val base = 1700000000000000000L // ~1.7e18, typical epoch nanos
    val ps = Seq((1L, base + 999L, "in"), (1L, base + 1000L, "out"))
      .toDF("k", "x", "pname")
    val ivs = Seq((1L, base, base + 1000L, "iv")).toDF("k", "lo", "hi", "ivname")
    val got = RangeJoin.pointInInterval(ps, ivs, Seq("k"), "x", "lo", "hi", 333L)
      .select("pname").as[String].collect().toSeq
    assert(got == Seq("in"))
  }

  test("matches a brute-force theta join on random data") {
    val rnd = new scala.util.Random(13)
    val ps = (0 until 200).map(i => (rnd.nextInt(3).toLong, rnd.nextInt(1000).toLong, i.toLong))
    val ivs = (0 until 50).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (rnd.nextInt(3).toLong, lo, lo + rnd.nextInt(150).toLong, i.toLong)
    }
    val pdf = ps.toDF("k", "x", "pid")
    val idf = ivs.toDF("k", "lo", "hi", "iid")
    val expect = (for {
      (pk, x, pid) <- ps; (ik, lo, hi, iid) <- ivs
      if pk == ik && x >= lo && x < hi
    } yield (pid, iid)).toSet
    val got = RangeJoin.pointInInterval(pdf, idf, Seq("k"), "x", "lo", "hi", 64L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == expect)
  }
}
