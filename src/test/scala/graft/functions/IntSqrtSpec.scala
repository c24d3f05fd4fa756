package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntSqrtSpec extends SparkSpec {

  test("graft_isqrt is exact for decimals across the full 38-digit range") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val vals = (Seq("0", "1", "2", "3", "4", "999999999999999999999999999999999999",
      "85070591730234615865843651857942052864") ++ // (2^63)^2 boundary
      (1 to 200).map(_ => BigInt(rnd.nextInt(120).max(1), rnd).toString)).toSeq
    val rows = vals.toDF("vs")
      .select(col("vs"), expr("graft_isqrt(cast(vs as decimal(38,0)))").as("r"))
      .collect()
    rows.foreach { r =>
      val v = BigInt(r.getString(0))
      if (v.bitLength > 125) () // beyond decimal(38) cast: skip
      else if (r.isNullAt(1)) {
        // null only when the root itself no longer fits a positive Long
        assert(v.bigInteger.sqrt().bitLength > 63, s"unexpected null for $v")
      } else {
        val got = BigInt(r.getLong(1))
        assert(got * got <= v && (got + 1) * (got + 1) > v, s"isqrt($v) = $got")
      }
    }
  }

  test("graft_isqrt boundary: roots near 2^63 and negative fractions") {
    val s = spark
    import s.implicits._
    // (2^62)^2 and (2^63-1)^2 have roots that FIT a positive Long and
    // must not be nulled; 2^126's root is exactly 2^63 → overflow → null
    val rows = Seq(
      ("21267647932558653966460912964485513216", Some(1L << 62)), // (2^62)^2
      ("85070591730234615847396907784232501249", Some(Long.MaxValue)), // (2^63-1)^2
      ("85070591730234615865843651857942052864", None)) // 2^126 → root 2^63
      .map(_._1).toDF("vs")
      .select(expr("graft_isqrt(cast(vs as decimal(38,0)))").as("r"), col("vs"))
      .collect()
    assert(rows.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
      == Seq(Some(1L << 62), Some(Long.MaxValue), None))
    // a negative fraction truncates to BigInteger zero but is still a
    // negative input → null, not 0
    val neg = spark.sql(
      "SELECT graft_isqrt(cast(-0.5 as decimal(5,2))) AS r").collect()(0)
    assert(neg.isNullAt(0))
  }

  test("graft_isqrt on bigint input and negative → null") {
    val s = spark
    import s.implicits._
    val rows = Seq(-5L, -1L, 0L, 1L, 2L, 99L, 100L, Long.MaxValue)
      .toDF("v").select(col("v"), expr("graft_isqrt(v)").as("r")).collect()
    rows.foreach { r =>
      val v = r.getLong(0)
      if (v < 0) assert(r.isNullAt(1))
      else {
        val got = r.getLong(1)
        assert(got * got <= v && (got + 1) * (got + 1) > v
          || (got + 1) * (got + 1) < 0 /* overflow of the check itself */,
          s"isqrt($v) = $got")
      }
    }
  }

  test("graft_isqrt agrees with the SQL correction ladder inside its range") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val vals = (1 to 100).map(_ => BigInt(60, rnd).toString)
    val rows = vals.toDF("vs")
      .select(expr("graft_isqrt(cast(vs as decimal(38,0)))").as("a"),
        expr("""cast(floor(sqrt(cast(cast(vs as decimal(38,0)) as double)))
          | as bigint)""".stripMargin).as("s0"),
        col("vs"))
      .withColumn("b", expr(
        """s0 + CASE
          |  WHEN cast(s0 + 2 as decimal(38,0)) * cast(s0 + 2 as decimal(38,0))
          |    <= cast(vs as decimal(38,0)) THEN 2
          |  WHEN cast(s0 + 1 as decimal(38,0)) * cast(s0 + 1 as decimal(38,0))
          |    <= cast(vs as decimal(38,0)) THEN 1
          |  WHEN cast(s0 as decimal(38,0)) * cast(s0 as decimal(38,0))
          |    <= cast(vs as decimal(38,0)) THEN 0
          |  WHEN cast(s0 - 1 as decimal(38,0)) * cast(s0 - 1 as decimal(38,0))
          |    <= cast(vs as decimal(38,0)) THEN -1
          |  ELSE -2 END""".stripMargin))
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(3),
      s"ladder disagrees at ${r.getString(2)}"))
  }
}
