package graft.engine

import org.apache.spark.sql.DataFrame

/** S4: the database sink. Reference writes timestamped per-year
  * CSV/RDS per table and re-combines chunks afterwards
  * (`build_efile_database_functions.R:5130-5163`,
  * `BUILD_SCRIPTS/README.md:388-427`); one partitioned parquet write
  * replaces the whole chunk-then-combine dance (S6 obsolete), and the
  * year partitioning gives downstream partition pruning.
  */
object Emit {

  def writeTable(df: DataFrame, outDir: String, table: String,
                 partitionCols: Seq[String] = Seq("TAXYR")): Unit = {
    val w = df.write.mode("overwrite")
    val parts = partitionCols.filter(df.columns.contains)
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
      .parquet(s"$outDir/$table")
  }

  /** CSV parity export (the reference's primary output format). */
  def exportCsv(df: DataFrame, outDir: String, table: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(s"$outDir/$table.csv")
}
