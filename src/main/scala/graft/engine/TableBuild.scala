package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Output-table builders (SURVEY §2.7 G1–G5 + §3.2): the wide 1:1
  * "core"-style tables and the exploded 1:M child tables, all derived
  * from one shared parsed scan.
  *
  * Reference: per-document R loops assembling `namedList`s and
  * `bind_rows` accumulators (`build_efile_database_functions.R:210-276,
  * 3189-3576, 5004-5122`). Here each table is ONE `select` over the
  * parsed corpus — header keys + synthesized extraction columns — and
  * 1:M tables are `explode` of the repeating-group array with parent
  * keys replicated by projection (J2, `:269-270`), so building all
  * tables is a handful of shuffles-free projections over a cached scan.
  */
object TableBuild {

  /** Header key columns replicated into every output table
    * (`:219-259`): EIN, NAME (era-coalesced), TAXYR, FORMTYPE,
    * OBJECT_ID (from the source url), URL.
    */
  def headerCols(df: DataFrame): Seq[Column] = Seq(
    Extract.scalar(df, Seq(
      "/Return/ReturnHeader/Filer/EIN")).as("EIN"),
    Extract.scalar(df, Seq(
      "/Return/ReturnHeader/Filer/BusinessName/BusinessNameLine1Txt",
      "/Return/ReturnHeader/Filer/BusinessName/BusinessNameLine1",
      "/Return/ReturnHeader/Filer/Name/BusinessNameLine1")).as("NAME"),
    Rules.taxYear(regexp_replace(Extract.scalar(df, Seq(
      "/Return/ReturnHeader/TaxPeriodEndDt",
      "/Return/ReturnHeader/TaxPeriodEndDate")), lit("-"), lit("")))
      .cast("string").as("TAXYR"),
    formType(df).as("FORMTYPE"),
    Extract.objectIdFromUrl(col("source_url")).as("OBJECT_ID"),
    col("source_url").as("URL"))

  def formType(df: DataFrame): Column =
    Extract.scalar(df, Seq(
      "/Return/ReturnHeader/ReturnTypeCd",
      "/Return/ReturnHeader/ReturnType"))

  /** A 1:1 table: header keys + one scalar extraction per declared-ONE
    * concordance variable of `table`, in concordance order.
    */
  def oneToOne(df: DataFrame, entries: Seq[ConcordanceEntry], table: String): DataFrame =
    wideTable(df, entries, _ == table)

  /** Generalized 1:1 projection over every table matching the filter —
    * used to assemble the full master-driven core (all `F9-PART-*`
    * variables as ONE wide select; the reference's 238-column `core`
    * is the equivalent assembled by hand in R).
    */
  def wideTable(df: DataFrame, entries: Seq[ConcordanceEntry],
                tableFilter: String => Boolean): DataFrame =
    df.select(headerCols(df) ++
      varColumns(df, entries, tableFilter).map { case (v, c) => c.as(v) }: _*)

  /** The per-variable extraction columns of a table slice, in
    * concordance order (era variants coalesced per variable).
    */
  def varColumns(df: DataFrame, entries: Seq[ConcordanceEntry],
                 tableFilter: String => Boolean): Seq[(String, Column)] = {
    val vars = entries.filter(e => tableFilter(e.rdbTable) && e.cardinality == "ONE")
    val byVar = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    vars.foreach(e => byVar(e.variable) = byVar.getOrElse(e.variable, Vector.empty) :+ e.xpath)
    byVar.map { case (v, xpaths) => v -> Extract.scalar(df, xpaths) }.toSeq
  }

  /** A 1:M child table (G4 `build_rdb_table`): explode each era variant
    * of the repeating group, extract that era's leaves renamed to
    * canonical names (G3 `re_name`), then union the eras by name —
    * per document exactly one era matches, so the union is disjoint.
    * Missing canonical columns are null-filled to a fixed schema.
    */
  /** One resolved era variant of a repeating group: its array column
    * over the parsed frame, the item struct type, and each canonical
    * variable's relative paths inside the item.
    */
  final case class EraGroup(prefix: Seq[String], itemType: StructType, arr: Column,
                            relByVar: Seq[(String, Vector[String])])

  /** The group-resolution half of the 1:M builder, reusable by staged
    * pipelines that pre-project the group arrays (FullBuild `flat`).
    */
  def eraGroups(df: DataFrame, entries: Seq[ConcordanceEntry], table: String): Seq[EraGroup] = {
    val tableEntries = entries.filter(e => e.rdbTable == table && e.cardinality == "MANY")
    Concordance.groupPaths(entries, table).flatMap { prefix0 =>
      val prefix = sinkToRepeated(df, tableEntries, prefix0)
      val groupXpath = "/Return/" + prefix.mkString("/")
      Extract.resolveRaw(df, groupXpath).flatMap { case (dt, groupCol) =>
        val resolved: Option[(StructType, Column)] = dt match {
          case ArrayType(st: StructType, _) => Some((st, groupCol))
          case st: StructType =>
            // single occurrence inferred as struct; guard the wrap so a
            // doc WITHOUT the group explodes to zero rows, not one
            // all-null row (R8 length-0→NA in the 1:M path)
            Some((st, when(groupCol.isNotNull, array(groupCol))))
          // divergence prefix landed on a scalar leaf (flat schedules
          // whose fields repeat directly under the schedule root, e.g.
          // MortgagesAndNotesPayableSch/MortgageAmt): not a group —
          // caller falls back to a 1:1 table
          case _ => None
        }
        resolved.map { case (itemType, arrCol) =>
          // relative paths for this era: strip the group prefix
          val relByVar = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
          tableEntries.foreach { e =>
            val segs = e.segments
            if (segs.startsWith(prefix) && segs.length > prefix.length)
              relByVar(e.variable) =
                relByVar.getOrElse(e.variable, Vector.empty) :+ segs.drop(prefix.length).mkString("/")
          }
          EraGroup(prefix, itemType, arrCol, relByVar.toSeq)
        }
      }
    }
  }

  /** Explode one era group into canonical-named columns. `headerSel`
    * supplies the replicated parent-key columns for the source frame.
    */
  def explodeGroup(df: DataFrame, g: EraGroup, arr: Column, headerSel: Seq[Column]): DataFrame = {
    val exploded = df.select(headerSel :+ explode(arr).as("item"): _*)
    val itemCols = g.relByVar.map { case (v, rels) =>
      Extract.relative(g.itemType, col("item"), rels).as(v)
    }
    exploded.select(headerNames.map(col) ++ itemCols: _*)
  }

  /** Union era variants by name and null-fill to the fixed canonical
    * schema; `emptyProto` must already carry the header columns.
    */
  def assembleChild(eraDfs: Seq[DataFrame], canonical: Seq[String],
                    emptyProto: => DataFrame): DataFrame = {
    val unioned = eraDfs match {
      case Seq() => // group absent from this corpus: empty table, fixed schema
        emptyProto.select(headerNames.map(col) ++
          canonical.map(v => lit(null).cast("string").as(v)): _*)
      case dfs => dfs.reduce(_.unionByName(_, allowMissingColumns = true))
    }
    val have = unioned.columns.toSet
    val out = canonical.filterNot(have.contains)
      .foldLeft(unioned)((d, v) => d.withColumn(v, lit(null).cast("string")))
    out.select((headerNames ++ canonical).map(col): _*)
  }

  def canonicalVars(entries: Seq[ConcordanceEntry], table: String): Seq[String] =
    entries.filter(e => e.rdbTable == table && e.cardinality == "MANY")
      .map(_.variable).distinct

  /** ONE canonical-normalized array column for a 1:M table: each era
    * variant's group array `transform`ed to a struct of the canonical
    * variables, variants concatenated (per document at most one era is
    * non-null). Staging this single column turns a child-table build
    * into one explode over one pruned cache column, instead of one
    * scan + union per era variant.
    */
  def normalizedGroupArray(df: DataFrame, entries: Seq[ConcordanceEntry],
                           table: String): Option[Column] =
    normalizedGroupArray(eraGroups(df, entries, table), entries, table)

  /** Variant over already-resolved groups — callers that resolved
    * `eraGroups` to classify tables (FullBuild) pass them in instead
    * of paying the schema walk twice.
    */
  def normalizedGroupArray(gs: Seq[EraGroup], entries: Seq[ConcordanceEntry],
                           table: String): Option[Column] = {
    val canonical = canonicalVars(entries, table)
    if (gs.isEmpty) None
    else {
      val variants = gs.map { g =>
        val relMap = g.relByVar.toMap
        transform(g.arr, item => struct(canonical.map { v =>
          relMap.get(v)
            .map(rels => Extract.relative(g.itemType, item, rels))
            .getOrElse(lit(null).cast("string")).as(v)
        }: _*))
      }
      Some(
        if (variants.size == 1) variants.head
        else flatten(filter(array(variants: _*), a => a.isNotNull)))
    }
  }

  /** Child table from a staged normalized array column. */
  def childFromNormalized(staged: DataFrame, arrCol: Column, canonical: Seq[String]): DataFrame =
    staged.select(headerNames.map(col) :+ explode(arrCol).as("item"): _*)
      .select(headerNames.map(col) ++ canonical.map(v => col("item").getField(v).as(v)): _*)

  def oneToMany(df: DataFrame, entries: Seq[ConcordanceEntry], table: String): DataFrame = {
    val eraDfs = eraGroups(df, entries, table).map(g =>
      explodeGroup(df, g, g.arr, headerCols(df)))
    assembleChild(eraDfs, canonicalVars(entries, table),
      df.limit(0).select(headerCols(df.limit(0)): _*))
  }

  val headerNames: Seq[String] = Seq("EIN", "NAME", "TAXYR", "FORMTYPE", "OBJECT_ID", "URL")

  /** G2's "re-derive the true table root when matches sit at different
    * depths": some era spellings wrap the repeating element in an extra
    * container (e.g. `Form990PartVIISectionB/ContractorCompensation`
    * where other eras repeat `ContractorCompensationGrp` directly). If
    * the divergence-derived prefix resolves to a non-repeated struct
    * and all of the era's field paths agree on the next segment, sink
    * the prefix until the repeated (ArrayType) element is found.
    */
  private def sinkToRepeated(df: DataFrame, entries: Seq[ConcordanceEntry],
                             prefix0: Seq[String]): Seq[String] = {
    var prefix = prefix0
    var continue = true
    while (continue) {
      continue = false
      Extract.resolveRaw(df, "/Return/" + prefix.mkString("/")) match {
        case Some((_: StructType, _)) =>
          val below = entries.filter(e =>
            e.segments.startsWith(prefix) && e.segments.length > prefix.length)
          val hasDirectLeaves = below.exists(_.segments.length == prefix.length + 1)
          val nexts = below.map(_.segments(prefix.length)).distinct
          // sink only when EVERY field of this era routes through one
          // shared container (no leaf sits directly at this level) —
          // otherwise this level IS the group (single-occurrence struct)
          if (!hasDirectLeaves && nexts.size == 1) {
            prefix = prefix :+ nexts.head
            continue = true
          }
        case _ => () // repeated element found, or path absent from corpus
      }
    }
    prefix
  }

  /** P4: schedule-presence flags — non-null schedule subtree after
    * parse (reference greps the serialized DOM, `:2522-2620`).
    */
  def schedulePresence(df: DataFrame, schedules: Seq[String]): DataFrame = {
    val flags = schedules.map { s =>
      val c = Extract.resolveRaw(df, s"/Return/ReturnData/IRS990Schedule$s")
        .map { case (_, c) => c.isNotNull }
        .getOrElse(lit(false))
      c.as(s"SCHED$s")
    }
    df.select(headerCols(df) ++ flags: _*)
  }
}
