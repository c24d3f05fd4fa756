package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The engine's determinism backbone is exact integer arithmetic in
  * DECIMAL(38,0) (quantized units, prefix sums, fixed-point
  * recurrences). At 100 TB the failure mode that matters is overflow:
  * it must be LOUD (a job-failing error), never a silent wrap or a
  * silent NULL that would flow into downstream sums as a dropped
  * contribution.
  *
  * Headroom arithmetic for the standing conventions (recorded here so
  * the numbers live next to the pin): values quantized at 1e9 units
  * with |v| <= 1e10 contribute <= 1e19 per row; 1e12 rows (a 100 TB
  * fact table) sum to <= 1e31 — seven orders of magnitude inside
  * DECIMAL(38,0). The fixed-point recurrences (4^t Holt, PageRank
  * nano-units) bound t/iterations explicitly in their queries.
  */
class DecimalHeadroomSpec extends SparkSpec {

  test("DECIMAL(38,0) sum overflow fails loudly under ANSI, never wraps") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "the engine assumes ANSI mode — a conf drift here would turn overflow into silent NULL")
    val nearMax = "9" * 38 // 10^38 - 1, the DECIMAL(38,0) ceiling
    val df = spark.range(2)
      .select(expr(s"CAST('$nearMax' AS DECIMAL(38,0))").as("v"))
    val thrown = intercept[Exception] {
      df.agg(sum(col("v"))).collect()
    }
    val msg = thrown.toString.toLowerCase
    assert(msg.contains("overflow") || msg.contains("out of range")
      || msg.contains("cannot be represented"), thrown.toString)
  }

  test("window prefix-sum overflow is equally loud") {
    import org.apache.spark.sql.expressions.Window
    val nearMax = "9" * 38
    val df = spark.range(2)
      .select(col("id"), expr(s"CAST('$nearMax' AS DECIMAL(38,0))").as("v"))
    val w = Window.orderBy(col("id")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thrown = intercept[Exception] {
      df.select(sum(col("v")).over(w).as("ps")).collect()
    }
    val msg = thrown.toString.toLowerCase
    assert(msg.contains("overflow") || msg.contains("out of range")
      || msg.contains("cannot be represented"), thrown.toString)
  }

  test("multiplication that exceeds 38 digits fails loudly too") {
    val big = "9" * 20
    val df = spark.range(1)
      .select(expr(s"CAST('$big' AS DECIMAL(38,0)) * CAST('$big' AS DECIMAL(38,0))").as("p"))
    val thrown = intercept[Exception] { df.collect() }
    val msg = thrown.toString.toLowerCase
    assert(msg.contains("overflow") || msg.contains("out of range")
      || msg.contains("cannot be represented"), thrown.toString)
  }
}
