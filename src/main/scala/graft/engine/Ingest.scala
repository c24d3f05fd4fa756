package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources (SURVEY §2.1): the yearly JSON index and the XML return
  * corpus, as declarative Spark reads.
  *
  * Reference: `buildIndex` fetches per-year JSON sequentially on one
  * thread and `bind_rows`s (`build_efile_database_functions.R:54-89`);
  * here one `spark.read.json` over all years lists+reads in parallel.
  * Documents: one HTTPS GET + DOM parse per doc in a loop (`:5004-5042`)
  * → one distributed XML scan; unreachable/corrupt docs land in
  * `_corrupt_record` (the FAIL_LIST analogue, `:5096-5101`) instead of
  * aborting tasks.
  */
object Ingest {

  /** Small-file split bundling for the XML corpus scan. The corpus is
    * millions of KB-sized files; Spark's default `openCostInBytes`
    * (4 MB) bin-packs only ~30 of them per 128 MB split, so a 20k-doc
    * scan plans ~600 splits — and EVERY split rebuilds the
    * per-reader conversion tree for the ~9,800-leaf sparse schema,
    * which dominates the parse (measured 5.7×: 33.6 s → 5.9 s full-row
    * parse at 20k docs, graft.engine.ParseFloor). With a realistic
    * open cost the planner's bytes-per-core formula
    * (`max(openCost, totalBytes/parallelism)` capped by
    * `maxPartitionBytes`) sizes splits to the cluster automatically —
    * one converter build per core, not per 30 documents. Env
    * overrides: GRAFT_MAX_PARTITION_BYTES / GRAFT_OPEN_COST_BYTES.
    */
  def tuneSmallFileSplits(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.files.maxPartitionBytes",
      sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", (512L * 1024 * 1024).toString))
    spark.conf.set("spark.sql.files.openCostInBytes",
      sys.env.getOrElse("GRAFT_OPEN_COST_BYTES", "8192"))
  }

  /** S1: index scan — all years in one read, deduped (P3), TaxYear
    * derived (R7). `paths` may be a glob (`.../index_*.json`).
    */
  def readIndex(spark: SparkSession, paths: String*): DataFrame =
    spark.read.option("multiLine", "true").json(paths: _*)
      .distinct()
      .withColumn("TaxYear", Rules.taxYear(col("TaxPeriod")))

  /** Typed view of the index (`Dataset[IndexEntry]`): compile-time
    * column safety for driver-side orchestration code.
    */
  def readIndexTyped(spark: SparkSession, paths: String*): org.apache.spark.sql.Dataset[IndexEntry] = {
    import spark.implicits._
    val df = readIndex(spark, paths: _*)
    val cols = df.columns.toSet
    def get(n: String) =
      if (cols.contains(n)) col(n).cast("string") else lit(null).cast("string")
    df.select(
        get("EIN").as("EIN"), get("TaxPeriod").as("TaxPeriod"), get("DLN").as("DLN"),
        get("FormType").as("FormType"), get("URL").as("URL"),
        get("OrganizationName").as("OrganizationName"), get("SubmittedOn").as("SubmittedOn"),
        get("ObjectId").as("ObjectId"), get("LastUpdated").as("LastUpdated"),
        col("TaxYear").cast("int").as("TaxYear"))
      .as[IndexEntry]
  }

  /** S2: XML corpus scan. PERMISSIVE + `_corrupt_record` quarantines
    * unparseable documents without failing the job. `schema` SHOULD be
    * passed at scale (sparse concordance-driven schema = subtree
    * pruning, SURVEY §4); inference is for tests/exploration.
    *
    * `ignoreNamespace=true` is load-bearing: real-world filings exist
    * with PREFIXED elements (`<efile:Return>`) instead of the usual
    * default namespace, and with the option off Spark's parser finds
    * no `Return` row tag at all — the document is SILENTLY DROPPED
    * (not even quarantined). The reference strips namespaces before
    * every xpath (`xml_ns_strip`, `build_efile_database_functions
    * .R:5030`); this option is the schema-first equivalent.
    */
  def readReturns(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val base = spark.read.format("xml")
      .option("rowTag", "Return")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .option("ignoreNamespace", "true")
    schema.fold(base)(s => base.schema(addCorruptField(s)))
      .load(path)
      .withColumn("source_url", input_file_name())
  }

  private def addCorruptField(s: StructType): StructType =
    if (s.fieldNames.contains("_corrupt_record")) s
    else s.add("_corrupt_record", org.apache.spark.sql.types.StringType, nullable = true)

  /** Duplicate-scalar violation log (SURVEY §7): for every dup-guarded
    * identity path that resolved to an array in `returns`' schema,
    * report documents where the element occurred more than once. The
    * EXTRACTION takes the first match (Extract.asScalar element 1 —
    * document order, the R xpath rule); this view is the "log
    * violations" half of the policy. One scan-stage projection + one
    * union per guarded path — no shuffle.
    */
  def duplicateScalars(returns: DataFrame,
                       guardPaths: Seq[String] = SchemaBuild.headerPaths): DataFrame = {
    val views = guardPaths.flatMap { p =>
      Extract.resolveRaw(returns, p).collect {
        case (org.apache.spark.sql.types.ArrayType(_, _), c) =>
          returns.filter(size(c) > 1)
            .select(col("source_url"), lit(p).as("xpath"),
              size(c).as("n_matches"),
              element_at(c, 1).cast("string").as("first_match"))
      }
    }
    views.reduceOption(_ unionByName _).getOrElse {
      returns.limit(0).select(col("source_url"), lit("").as("xpath"),
        lit(0).as("n_matches"), lit("").as("first_match"))
    }
  }

  /** S5: the quarantine view (reference FAIL_LIST). The input must be
    * cached/persisted first — Spark refuses corrupt-column-only queries
    * against a raw file scan (Pipeline.build persists the parse).
    */
  def failed(returns: DataFrame): DataFrame =
    if (returns.columns.contains("_corrupt_record"))
      returns.filter(col("_corrupt_record").isNotNull).select(col("source_url"))
    else returns.limit(0).select(col("source_url"))

  /** S5 completed to the reference's FAIL_LIST row shape
    * (`build_efile_database_functions.R:5094-5098`): what the
    * reference appends to FAIL_LIST.csv is
    * `index[ index$URL %in% failed.urls, ]` — the INDEX ROWS of the
    * failed documents, so retry tooling gets EIN / TaxPeriod /
    * FormType / OrganizationName metadata, not bare paths. The
    * quarantine records local file paths while the index records
    * canonical URLs, so the join key is the ObjectId (E6) both
    * basenames share. The quarantine side is a tiny fraction of the
    * corpus by construction — broadcast it; the index never shuffles.
    */
  def failList(index: DataFrame, failed: DataFrame): DataFrame =
    index.join(
      broadcast(failed.select(
        Extract.objectIdFromUrl(col("source_url")).as("__fail_oid")).distinct()),
      Extract.objectIdFromUrl(col("URL")) === col("__fail_oid"), "left_semi")
}
