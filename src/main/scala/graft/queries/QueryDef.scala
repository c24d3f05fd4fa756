package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered operator demonstration: a Spark query over the
  * TESTDATA tables plus (when SQL-expressible) an equivalent DuckDB
  * oracle query. Column names/types are aligned between the two so the
  * driver's sort-columns-then-hash compare passes.
  *
  * Numeric discipline (so hashes match bit-for-bit):
  *   - sums of doubles go through DECIMAL casts (exact, order-independent)
  *     and back to double;
  *   - per-row double arithmetic uses identical operation order in both
  *     engines (IEEE 754 is deterministic given the same ops);
  *   - integer sums are CAST(... AS BIGINT) in DuckDB (its SUM(int)
  *     returns HUGEINT).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
