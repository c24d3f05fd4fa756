package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Load + normalize the concordance crosswalk and derive the metadata
  * the extraction layer needs (SURVEY §2.7 G1–G3).
  *
  * Reference behaviors re-expressed (not ported):
  *  - name normalization: upper-case, `-`→`_`
  *    (`build_efile_database_functions.R:123,5191`)
  *  - `find_group_names` (`:121-134`): the repeating-group element of a
  *    1:M table = the first path segment where the table's xpaths
  *    diverge
  *  - `get_var_map` (`:141-151`): raw leaf name (last segment) →
  *    canonical variable name
  *
  * The concordance is driver-side metadata (a few thousand rows): we
  * collect it once and synthesize Catalyst `Column` trees from it —
  * the runtime equivalent of the reference's `create_code_chunks` R
  * code generation (`:5186-5291`), with whole-stage codegen doing the
  * compiling.
  */
object Concordance {

  /** Read a concordance CSV shaped like `ConcordancePartVII.csv`
    * (header row; columns xpath, variable_name_new, data_type_simple,
    * cardinality, rdb_table, scope, versions, production_rule).
    */
  def readCsv(spark: SparkSession, path: String): Seq[ConcordanceEntry] = {
    val df = spark.read.option("header", "true").csv(path)
    fromDf(df)
  }

  def fromDf(df: DataFrame): Seq[ConcordanceEntry] = {
    val cols = df.columns.toSet
    // both crosswalk dialects: the table-slice CSVs
    // (ConcordancePartVII.csv header) and MASTER_CONCORDANCE_V0.csv
    // (VAR_NAME/XPATH/DATABASE_TABLE...). DATABASE_TABLE is empty in
    // V0, so FORM-PART serves as the table key there.
    def first(names: String*): org.apache.spark.sql.Column =
      names.find(cols.contains).map(n => nullif(col(n), lit("")))
        .getOrElse(lit(null).cast("string"))
    df.select(
        first("variable_name_new", "VAR_NAME").as("v"),
        first("xpath", "XPATH").as("x"),
        first("data_type_simple", "DATA_TYPE").as("t"),
        first("cardinality", "CARDINALITY").as("c"),
        // fallback table key FORM-PART covers both the V0 master (no
        // DATABASE_TABLE) and slice rows with a blank rdb_table cell
        // (e.g. PartVII's TotalPartVII row)
        coalesce(first("rdb_table", "DATABASE_TABLE"),
          concat_ws("-", first("FORM", "form"), first("PART", "part"))).as("r"),
        first("scope", "SCOPE").as("s"),
        first("versions", "XSD_VERSIONS").as("ver"),
        first("production_rule", "PRODUCTION_RULE").as("p"))
      .collect().toSeq
      .filter(r => r.getString(0) != null && r.getString(1) != null)
      .flatMap { r =>
        // master V0 packs era variants into one cell ("a; b"); each
        // becomes its own entry (the slice CSVs use one row per era)
        r.getString(1).split(";").toSeq.map(_.trim).filter(_.nonEmpty).map { xp =>
        ConcordanceEntry(
          variable = normalizeName(r.getString(0)),
          xpath = if (xp.startsWith("/")) xp else "/" + xp,
          dataType = Option(r.getString(2)).getOrElse("text"),
          cardinality = Option(r.getString(3)).getOrElse("ONE"),
          rdbTable = Option(r.getString(4)).getOrElse(""),
          scope = Option(r.getString(5)).getOrElse(""),
          versions = Option(r.getString(6)).map(_.split(";").toSeq.filter(_.nonEmpty)).getOrElse(Nil),
          productionRule = Option(r.getString(7)).filter(s => s.nonEmpty && s != "NA"))
        }
      }
  }

  /** Upper-case + `-`→`_` (reference `:123, :5191`). */
  def normalizeName(s: String): String = s.trim.toUpperCase.replace("-", "_")

  /** Era-variant xpaths per canonical variable, insertion-ordered
    * (variants are era-exclusive, so coalesce order only matters for
    * malformed docs; we keep concordance order for determinism).
    */
  def variants(entries: Seq[ConcordanceEntry]): Map[String, Seq[String]] =
    entries.groupBy(_.variable).view.mapValues(_.map(_.xpath).distinct).toMap

  /** The repeating-group path prefix(es) of a 1:M table (reference
    * `find_group_names`): the first segment where the table's xpaths
    * diverge names the group element — one prefix per era spelling.
    * When the divergence is only at the terminal segment (a single era
    * spelling: the diverging segments are the leaf fields themselves),
    * the group is the common parent instead.
    */
  /** Elements that are document singletons by XSD definition — they can
    * never be a repeating group, whatever the path divergence suggests
    * (guards scalar indicator "tables" like F9-P07-TABLE-03, whose 6
    * era spellings diverge at the leaf under the form root).
    */
  private val SingletonRoots =
    Set("ReturnData", "ReturnHeader", "IRS990", "IRS990EZ", "IRS990PF")

  def groupPaths(entries: Seq[ConcordanceEntry], table: String): Seq[Seq[String]] = {
    val paths = entries.filter(e => e.rdbTable == table && e.cardinality == "MANY")
      .map(_.segments)
    if (paths.isEmpty) return Nil
    // divergence is detected on IRS990EZ→IRS990-normalized segments
    // (reference `:126`: the same logical table spans both forms, and
    // the form element must not read as the repeating group); the real
    // spellings are kept for path resolution.
    val norm = paths.map(_.map(_.replace("IRS990EZ", "IRS990")))
    val minLen = paths.map(_.length).min
    val raw = (0 until minLen).find(i => norm.map(_(i)).distinct.size > 1) match {
      case None => paths.map(_.take(minLen - 1)).distinct
      case Some(i) if i == minLen - 1 && paths.forall(_.length == minLen) =>
        paths.map(_.take(i)).distinct // leaf-level divergence: group = common parent
      case Some(i) => paths.map(_.take(i + 1)).distinct
    }
    raw.filterNot(p => p.lastOption.exists(SingletonRoots.contains))
  }

  /** Raw leaf name → canonical variable for a table (reference
    * `get_var_map`): last path segment wins; later entries overwrite.
    */
  def varMap(entries: Seq[ConcordanceEntry], table: String): Map[String, String] =
    entries.filter(_.rdbTable == table)
      .map(e => e.segments.last.stripPrefix("@") -> e.variable).toMap
}
