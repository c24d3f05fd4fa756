package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Thirty-first frontier batch: Benford conformance — the query that
  * rounds the registered surface to 300.
  */
object Frontier31Queries {

  /** Benford P(d) = log10(1 + 1/d), written once as 6-dp literals so
    * both engines consume the IDENTICAL expected distribution (no ln
    * in the hash path at all).
    */
  private val benford: Seq[(Int, Double)] = Seq(
    1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.096910,
    5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153, 9 -> 0.045757)

  val defs: Seq[QueryDef] = Seq(

    // ---- A80: Benford conformance test ---------------------------------------
    // a23 reports the first-digit histogram; this one finishes the
    // audit: observed counts vs the Benford expectation with a chi²
    // conformance statistic. The expected distribution ships as nine
    // fixed 6-dp literals (identical bytes in both engines — no libm
    // call anywhere), digits come from integer string arithmetic (the
    // a23 rule), each cell's (O−E)²/E rounds to 8 dp and sums as
    // DECIMAL over the 9-row digit grain. One scan + one bounded-key
    // rollup.
    QueryDef.sql(
      "a80_benford_conformance", {
        val values = benford.map { case (dd, p) => s"($dd, $p)" }.mkString(", ")
        s"""WITH digits AS (
           |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1)
           |    AS INTEGER) AS d
           |  FROM orders WHERE o_totalprice > 0),
           |obs AS (
           |  SELECT d, CAST(count(*) AS BIGINT) AS o FROM digits GROUP BY 1),
           |exp_p AS (SELECT * FROM (VALUES $values) AS t(d, p)),
           |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
           |cells AS (
           |  SELECT e.d, COALESCE(obs.o, 0) AS o, e.p * CAST(n.n AS DOUBLE) AS expected
           |  FROM exp_p e LEFT JOIN obs ON obs.d = e.d CROSS JOIN n),
           |terms AS (
           |  SELECT d, o, round(expected, 6) AS expected,
           |    CAST(round((CAST(o AS DOUBLE) - expected) * (CAST(o AS DOUBLE) - expected)
           |      / expected, 8) AS DECIMAL(20,8)) AS term
           |  FROM cells)
           |SELECT d AS digit, o AS observed, expected,
           |  round(CAST((SELECT sum(term) FROM terms) AS DOUBLE), 6) AS chi2
           |FROM terms""".stripMargin
      }) { (s, d) =>
      import s.implicits._
      val expP = broadcast(benford.toDF("d", "p"))
      val digits = Tables.orders(s, d)
        .filter(col("o_totalprice") > 0)
        .select(substring(floor(col("o_totalprice") * 100).cast("long").cast("string"), 1, 1)
          .cast("int").as("d"))
      val obs = digits.groupBy(col("d")).agg(count(lit(1)).as("o"))
      val n = obs.agg(sum(col("o")).as("n"))
      val cells = expP.join(obs, Seq("d"), "left")
        .crossJoin(broadcast(n))
        .select(col("d"), coalesce(col("o"), lit(0L)).as("o"),
          (col("p") * col("n").cast("double")).as("expected"))
      val term = round((col("o").cast("double") - col("expected"))
        * (col("o").cast("double") - col("expected")) / col("expected"), 8)
        .cast(DecimalType(20, 8))
      val terms = cells.select(col("d"), col("o"), round(col("expected"), 6).as("expected"),
        term.as("term"))
      val chi2 = terms.agg(round(sum(col("term")).cast("double"), 6).as("chi2"))
      terms.crossJoin(broadcast(chi2))
        .select(col("d").as("digit"), col("o").as("observed"), col("expected"),
          col("chi2"))
    }
  )
}
