package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft_dupgrams must equal the built-in (interpreted) formulation
  * `size(transform(...)) - size(array_distinct(transform(...)))` —
  * the t81 contract — on random token arrays and every boundary
  * (L < n, L = n, n = 1, empty array, nulls, repeats).
  */
class DupNgramsSpec extends SparkSpec {

  private def hofDup = expr(
    """case when n > 0 and size(t) >= n then
      |  size(transform(sequence(1, size(t) - n + 1),
      |    i -> array_join(slice(t, i, n), ' ')))
      |  - size(array_distinct(transform(sequence(1, size(t) - n + 1),
      |    i -> array_join(slice(t, i, n), ' '))))
      |else 0 end""".stripMargin)

  test("equals the transform/array_distinct formulation on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // small alphabet forces plenty of repeated windows at every n
    val rows = (1 to 300).map { i =>
      val len = rnd.nextInt(30)
      (i.toLong, (0 until len).map(_ => s"w${rnd.nextInt(5)}"))
    }
    val df = rows.toDF("id", "t")
      .crossJoin(spark.range(1, 7).toDF("n"))
    val both = df.select(
      DupNgrams.dupNgramsNative(col("t"), col("n")).as("native"),
      hofDup.cast("long").as("ref"))
    assert(both.filter(col("native") =!= col("ref")).count() == 0)
    assert(both.filter(col("native") > 0).count() > 100) // non-trivial corpus
  }

  test("boundaries: L < n, L = n, n = 1, empty, repeats") {
    import spark.implicits._
    val cases = Seq(
      (Seq("a", "b", "a", "b", "a"), 2, 2L), // "a b" x3, "b a" x2 -> 2+1 dups? -> ab ab ba ba -> windows: ab,ba,ab,ba -> 2 dups
      (Seq("a", "a", "a"), 1, 2L),           // three "a" -> 2 dups
      (Seq("a", "a", "a"), 3, 0L),           // single window
      (Seq("a", "b"), 3, 0L),                // L < n
      (Seq.empty[String], 1, 0L),            // empty
      (Seq("x"), 1, 0L))
    val df = cases.toDF("t", "n", "want")
    val bad = df.filter(
      DupNgrams.dupNgramsNative(col("t"), col("n")) =!= col("want"))
    assert(bad.count() == 0, bad.collect().mkString(", "))
  }

  test("null array, null n, and non-positive n") {
    import spark.implicits._
    val df = Seq((1L, Seq("a", "b"))).toDF("id", "t")
    val r1 = df.select(DupNgrams.dupNgramsNative(
      lit(null).cast("array<string>"), lit(2))).head()
    assert(r1.isNullAt(0))
    val r2 = df.select(DupNgrams.dupNgramsNative(
      col("t"), lit(null).cast("int"))).head()
    assert(r2.isNullAt(0))
    val r3 = df.select(DupNgrams.dupNgramsNative(col("t"), lit(0))).head()
    assert(r3.getLong(0) == 0L)
  }

  test("codegen and interpreted paths agree") {
    import spark.implicits._
    val df = Seq((Seq("a", "b", "a", "b"), 2)).toDF("t", "n")
    val modes = Seq("CODEGEN_ONLY", "NO_CODEGEN").map { m =>
      spark.conf.set("spark.sql.codegen.factoryMode", m)
      try df.select(DupNgrams.dupNgramsNative(col("t"), col("n"))).head().getLong(0)
      finally spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(modes == Seq(1L, 1L))
  }
}
