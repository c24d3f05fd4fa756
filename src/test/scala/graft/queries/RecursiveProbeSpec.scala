package graft.queries

import graft.SparkSpec

/** Probe: does Spark 4.1.2 execute WITH RECURSIVE? (SPARK-24497 landed
  * in 4.0; this pins that the runtime actually supports it before we
  * register a transitive-closure query against DuckDB's recursive CTE.)
  */
class RecursiveProbeSpec extends SparkSpec {
  test("WITH RECURSIVE executes a bounded recurrence") {
    val rows = spark.sql(
      """WITH RECURSIVE t(n) AS (
        |  SELECT 1
        |  UNION ALL
        |  SELECT n + 1 FROM t WHERE n < 5
        |) SELECT * FROM t ORDER BY n""".stripMargin)
      .collect().map(_.getInt(0)).toSeq
    assert(rows == Seq(1, 2, 3, 4, 5))
  }
}
