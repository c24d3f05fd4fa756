package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SortedOverlapSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random sorted distinct string arrays
  private def arr(seed: Int, n: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(s"t${rnd.nextInt(200)}").distinct.sorted
  }

  test("native overlap matches size(array_intersect) on sorted distinct arrays") {
    val df = Seq.tabulate(200)(i => (arr(i, 30), arr(i + 1000, 45))).toDF("a", "b")
    val got = df.select(
        SortedOverlap.overlapNative($"a", $"b").as("native"),
        size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, r) => assert(n == r, s"$n != $r") }
    assert(got.exists(_._1 > 0), "fixture should produce non-trivial overlaps")
  }

  test("null array yields null; empty and disjoint arrays yield 0") {
    val df = Seq(
      (Some(Seq("a")), None: Option[Seq[String]]),
      (Some(Seq.empty[String]), Some(Seq("a"))),
      (Some(Seq("a", "b")), Some(Seq("c", "d")))).toDF("a", "b")
    val got = df.select(SortedOverlap.overlapNative($"a", $"b"))
      .as[Option[Long]].collect().toSeq
    assert(got == Seq(None, Some(0L), Some(0L)))
  }

  test("graft_overlap is callable from SQL via GraftExtensions") {
    assume(spark.conf.getOption("spark.sql.extensions").exists(_.contains("GraftExtensions")))
    val r = spark.sql(
      "SELECT graft_overlap(array('a','b','c'), array('b','c','d')) AS o")
      .as[Long].head()
    assert(r == 2L)
  }

  test("array<long> variant matches size(array_intersect); integer compare path") {
    val rnd = new scala.util.Random(3)
    def larr(n: Int): Seq[Long] = Seq.fill(n)(rnd.nextInt(500).toLong).distinct.sorted
    val df = Seq.tabulate(200)(_ => (larr(40), larr(60))).toDF("a", "b")
    val got = df.select(
        SortedOverlap.overlapNative($"a", $"b").as("native"),
        size(array_intersect($"a", $"b")).cast("long").as("ref"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, r) => assert(n == r, s"$n != $r") }
    assert(got.exists(_._1 > 0), "fixture should produce non-trivial overlaps")
  }

  test("mixed array<string>/array<long> arguments fail analysis") {
    val df = Seq((Seq("a"), Seq(1L))).toDF("a", "b")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(SortedOverlap.overlapNative($"a", $"b")).collect()
    }
    assert(e.getMessage.contains("graft_overlap"))
  }

  test("interpreted eval agrees with codegen") {
    val e = SortedOverlap(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a", "c", "e"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("b", "c", "d", "e"),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)))
    assert(e.eval(null) == 2L)
  }
}
