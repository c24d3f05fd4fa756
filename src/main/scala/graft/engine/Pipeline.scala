package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** The full build (SURVEY §3.2 `buildDatabase` re-expressed): ONE
  * distributed job — parse the corpus once, cache it, derive every
  * output table as a projection, write each partitioned by year.
  *
  * Replaces the reference's per-document loop + retry + chunk/combine
  * orchestration (`build_efile_database_functions.R:4938-5177`,
  * `BUILD_SCRIPTS/README.md:294-427`) with lineage + task retry + one
  * partitioned write per table. At 100 TB: the parse is the dominant
  * cost and is paid once (MEMORY_AND_DISK cache shared by all 9
  * projections); each table write is shuffle-free (projection + explode
  * only).
  */
object Pipeline {

  final case class Outputs(core: DataFrame, typedCore: DataFrame,
                           core238: DataFrame,
                           children: Map[String, DataFrame],
                           tableOnes: Map[String, DataFrame],
                           presence: DataFrame, failed: DataFrame)

  /** The schedule letters the reference flags in its core — derived
    * from the curated-core metadata (kind=sched rows), so the presence
    * table and Core238's SCHED* columns can't diverge.
    */
  def presenceSchedules: Seq[String] = Core238.scheduleLetters

  /** The corpus parse `build` derives everything from — exposed so
    * callers (and specs) can run side views like
    * [[Ingest.duplicateScalars]] against the same sparse schema.
    */
  def parse(spark: SparkSession, corpusPath: String,
            concordance: Seq[ConcordanceEntry],
            inferSchema: Boolean = false): DataFrame = {
    // Default: concordance-derived sparse schema (Core's declared paths
    // + headers + crosswalk) — no inference pass, no undeclared subtree
    // parsing. Inference is opt-in for exploration only: on a 3M-doc
    // corpus it is a full extra read of every byte.
    val schema =
      if (inferSchema) None
      else Some(SchemaBuild.sparseSchema(concordance,
        SchemaBuild.headerPaths ++ Core.declaredPaths ++ Core238.declaredPaths ++
          presenceSchedules.map(s => s"/Return/ReturnData/IRS990Schedule$s")))
    Ingest.readReturns(spark, corpusPath, schema)
  }

  def build(spark: SparkSession, corpusPath: String,
            concordance: Seq[ConcordanceEntry],
            inferSchema: Boolean = false): Outputs = {
    val raw = parse(spark, corpusPath, concordance, inferSchema)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // quarantined documents feed ONLY the fail list — every derived
    // table builds from clean parses (reference: FAIL_LIST rows are
    // retried/skipped, never emitted into tables, R:5047-5101)
    val parsed =
      if (raw.columns.contains("_corrupt_record"))
        raw.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull)
      else raw
    val core = Core.build(parsed)
    val childTables = concordance.filter(_.cardinality == "MANY").map(_.rdbTable).distinct
    val children = childTables.map(t => t -> TableBuild.oneToMany(parsed, concordance, t)).toMap
    // crosswalk-declared 1:1 tables (e.g. PART VII table 00, Sched J
    // checklist) — distinct from the hand-curated core
    val oneTables = concordance
      .filter(e => e.cardinality == "ONE" && e.rdbTable.nonEmpty)
      .map(_.rdbTable).distinct
    val tableOnes = oneTables.map(t => t -> TableBuild.oneToOne(parsed, concordance, t)).toMap
    Outputs(core, Core.typedView(core), Core238.build(parsed), children, tableOnes,
      TableBuild.schedulePresence(parsed, presenceSchedules), Ingest.failed(raw))
  }

  /** `csv = true` additionally writes each table as headered CSV —
    * the reference's primary output format (`write.csv` alongside
    * `.rds` per table, `build_efile_database_functions.R:5130-5163`).
    */
  def writeAll(out: Outputs, outDir: String, csv: Boolean = false): Unit = {
    def emit(df: DataFrame, t: String): Unit = {
      Emit.writeTable(df, outDir, t)
      if (csv) Emit.exportCsv(df, outDir, t)
    }
    emit(out.core, "core")
    // the reference's flagship curated 238-column core layout
    emit(out.core238, "core238")
    out.children.foreach { case (t, df) => emit(df, t) }
    out.tableOnes.foreach { case (t, df) => emit(df, t) }
    emit(out.presence, "schedule_presence")
    // FAIL_LIST analogue (R:4966-5101): quarantined documents with
    // their raw payloads, written even when empty so downstream
    // retry tooling always finds the table
    out.failed.write.mode("overwrite").parquet(s"$outDir/failed")
    if (csv) Emit.exportCsv(out.failed, outDir, "failed")
  }
}

/** Runnable end-to-end demo over the fixture corpus: parse → core +
  * Part VII child table → parquet, then a SQL aggregate over the
  * result (the SURVEY §7 minimum slice query).
  */
object BuildDemo {
  def main(args: Array[String]): Unit = {
    val flags = args.filter(_.startsWith("--")).toSet
    val pos = args.filterNot(_.startsWith("--"))
    val corpus = pos.headOption.getOrElse("src/test/resources/xml")
    val outDir = if (pos.length > 1) pos(1) else "/tmp/graft_990_out"
    val csv = flags.contains("--csv")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def pv(v: String, x: String) = ConcordanceEntry(v, x, "text", "MANY", "PART-VII-01", "PC", Nil, None)
    val concordance = Seq(
      pv("DTK_NAME", "/Return/ReturnData/IRS990/Form990PartVIISectionAGrp/PersonNm"),
      pv("DTK_NAME", "/Return/ReturnData/IRS990/Form990PartVIISectionA/NamePerson"),
      pv("DTK_TITLE", "/Return/ReturnData/IRS990/Form990PartVIISectionAGrp/TitleTxt"),
      pv("DTK_TITLE", "/Return/ReturnData/IRS990/Form990PartVIISectionA/Title"),
      pv("DTK_COMP_ORG", "/Return/ReturnData/IRS990/Form990PartVIISectionAGrp/ReportableCompFromOrgAmt"),
      pv("DTK_COMP_ORG", "/Return/ReturnData/IRS990/Form990PartVIISectionA/ReportableCompFromOrganization"))

    val out = Pipeline.build(spark, corpus, concordance)
    Pipeline.writeAll(out, outDir, csv = csv)

    println(s"[demo] corpus=$corpus out=$outDir failed=${out.failed.count()}")
    spark.read.parquet(s"$outDir/core").createOrReplaceTempView("core")
    spark.read.parquet(s"$outDir/PART-VII-01").createOrReplaceTempView("partvii")
    spark.sql(
      """SELECT FORMTYPE, count(*) AS n, sum(CAST(TOTALREVCURRENT AS LONG)) AS total_rev
        |FROM core GROUP BY FORMTYPE ORDER BY FORMTYPE""".stripMargin).show()
    spark.sql(
      """SELECT c.EIN, c.NAME, p.DTK_NAME, p.DTK_TITLE, CAST(p.DTK_COMP_ORG AS LONG) AS comp
        |FROM core c JOIN partvii p ON c.EIN = p.EIN AND c.OBJECT_ID = p.OBJECT_ID
        |ORDER BY comp DESC""".stripMargin).show(truncate = false)
    spark.stop()
  }
}
