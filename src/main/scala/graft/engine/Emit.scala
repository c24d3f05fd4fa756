package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

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
    val dir = s"$outDir/$table"
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w).parquet(dir)
    // a partitionBy write of an EMPTY frame emits no parquet footers
    // at all (only _SUCCESS), leaving a directory downstream reads
    // cannot infer a schema from — and an empty year partition is a
    // routine state, not an error. Detect it by listing (driver-side,
    // no extra job) and write one schema-bearing empty file instead;
    // the partition column survives as a regular (empty) column.
    if (parts.nonEmpty && !hasFileWith(df, dir, ".parquet"))
      df.limit(0).write.mode("overwrite").parquet(dir)
  }

  /** Driver-side recursive listing: any file under `dir` with the
    * suffix (Hadoop FS API, so it holds on HDFS/S3, not just local).
    */
  private def hasFileWith(df: DataFrame, dir: String, suffix: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    def has(d: org.apache.hadoop.fs.Path): Boolean =
      fs.listStatus(d).exists { st =>
        if (st.isDirectory) has(st.getPath)
        else st.getPath.getName.endsWith(suffix)
      }
    has(p)
  }

  /** CSV parity export in the reference's exact `write.csv` byte
    * format (its primary output, `build_efile_database_functions
    * .R:5151-5163`): string values always quoted with embedded quotes
    * DOUBLED, NULL as the UNQUOTED bare token `NA` (distinct from the
    * quoted string "NA" — R's quote=TRUE quotes character values but
    * never the NA token), numeric columns unquoted, quoted header.
    *
    * Spark's CSV writer cannot produce this combination (quoteAll
    * quotes the null token; minimal quoting writes the string "NA"
    * bare, colliding with NULL; its escape default is backslash, not
    * doubling), so each record is formatted by a codegen'd projection
    * — per-field quote/double/NA-fill, then one concat_ws — and
    * written through a writer whose delimiter (U+0001) and quote
    * (U+0000) can never occur, with the R header line smuggled in as
    * the single column's name. Files stay one-per-partition with a
    * header each — the reference's own chunk-then-combine layout
    * (S6); deliberate deviation: R's default row.names=TRUE index
    * column on the non-core tables is a numbering artifact, not data,
    * and is not reproduced.
    */
  def exportCsv(df: DataFrame, outDir: String, table: String): Unit = {
    val fields = df.schema.fields.map { f =>
      val c = col(f.name)
      f.dataType match {
        case StringType =>
          coalesce(concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\"")), lit("NA"))
        case _ => coalesce(c.cast("string"), lit("NA"))
      }
    }
    val header = df.schema.fieldNames.map(n => "\"" + n + "\"").mkString(",")
    df.select(concat_ws(",", fields.toSeq: _*).as(header))
      .write.mode("overwrite")
      .option("header", "true")
      .option("delimiter", "\u0001")
      .option("quote", "\u0000")
      .csv(s"$outDir/$table.csv")
    // R's write.csv of an empty frame still writes the header line;
    // Spark's writer emits no part file for an empty frame, so write
    // the header-only file directly (same byte format)
    if (!hasFileWith(df, s"$outDir/$table.csv", ".csv")) {
      val p = new org.apache.hadoop.fs.Path(s"$outDir/$table.csv/part-00000-empty.csv")
      val fs = p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
      val out = fs.create(p, true)
      out.write((header + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.close()
    }
  }
}
