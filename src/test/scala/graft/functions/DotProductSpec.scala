package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("native dot matches the built-in higher-order formulation bit-for-bit") {
    val df = Seq.tabulate(100) { i =>
      (Seq.tabulate(64)(j => (i * 64 + j) * 0.137 - 3.0),
        Seq.tabulate(64)(j => (j * 31 + i) * 0.071 - 1.0))
    }.toDF("a", "b")
    val builtin = aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val got = df.select(
      DotProduct.dotNative($"a", $"b").as("native"), builtin.as("ref"))
      .as[(Double, Double)].collect()
    got.foreach { case (n, r) => assert(n == r, s"$n != $r") }
  }

  test("null array yields null; empty arrays yield 0.0") {
    val df = Seq(
      (Some(Seq(1.0)), None: Option[Seq[Double]]),
      (Some(Seq.empty[Double]), Some(Seq.empty[Double]))).toDF("a", "b")
    val got = df.select(DotProduct.dotNative($"a", $"b")).as[Option[Double]].collect().toSeq
    assert(got == Seq(None, Some(0.0)))
  }

  test("graft_dot is callable from SQL via GraftExtensions") {
    assume(spark.conf.getOption("spark.sql.extensions").exists(_.contains("GraftExtensions")))
    val r = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(r == 11.0)
  }

  test("codegen path: expression works inside a wholestage-codegen projection") {
    // 1000 rows through the generated code path (not just interpreted eval)
    val df = spark.range(1000).select(
      transform(sequence(lit(0), lit(15)), i => (col("id") + i).cast("double")).as("a"),
      transform(sequence(lit(0), lit(15)), i => (col("id") * 2 + i).cast("double")).as("b"))
    val s = df.select(sum(DotProduct.dotNative($"a", $"b")).as("s")).as[Double].head()
    assert(s > 0.0)
  }
}
