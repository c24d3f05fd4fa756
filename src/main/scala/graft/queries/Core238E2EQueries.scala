package graft.queries

import graft.engine.{Core238, CoreVar, Ingest, SchemaBuild}
import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable

/** End-to-end oracle for the curated CORE-238 build: synthesize a
  * deterministic XML corpus, run it through the REAL extraction path —
  * sparse-schema parse ([[SchemaBuild.sparseSchema]]) → version
  * coalesce / attribute / multi-value extraction → production rules
  * ([[Core238.build]], reference semantics at
  * `build_efile_database_functions.R:307-2850`) — and hash-check all
  * 237 columns against a DuckDB oracle that recomputes every expected
  * value from the generator's closed-form parameters.
  *
  * This closes the gap `core238_rules` leaves open: that query feeds
  * synthetic RAW values straight into the rule layer, so the xpath
  * resolution in `core238.csv` and the whole parse/extract machinery
  * were previously covered only by 7 fixture docs. Here the corpus is
  * emitted AT the declared xpaths, so a broken sparse schema, a
  * mis-walked path, wrong coalesce order, or broken attribute/
  * multi-value/presence handling all surface as hash mismatches.
  *
  * Determinism model (mirrored exactly in [[oracleSql]]):
  *  - doc_id i ∈ [0, NDocs); form type = i%3 → 990 / 990EZ / 990PF
  *  - every DISTINCT declared xpath p gets a stable id `pid` (first-
  *    appearance order over `Core238.vars`); p is *emitted* on doc i
  *    iff its form subtree admits the form type and (i + pid) % 3 != 0
  *  - emitted value = (i*7 + pid*13) % 100000, written as element text
  *    (or attribute value for `@` paths)
  *  - EIN and FORMTYPE paths are forced: always emitted, values i and
  *    the form type (both eras' spellings, exercising coalesce)
  *  - schedule roots additionally emitted when (i + varIdx) % 5 == 0
  *    (the flag may ALSO read true when a declared child path under the
  *    root fired — presence is element existence, reference `R:2522`)
  *  - element-as-branch paths (Organization501c*, read by the
  *    label-recode EXEMPT501C while `@`-paths extend the same element)
  *    yield a struct whose exact string form is unpredictable — allowed
  *    only for label/sched consumers, where nullity alone matters
  *    (statically enforced by [[validate]]).
  */
object Core238E2E {

  val NDocs = 300
  val WorkDir = "/tmp/graft_core238_e2e"
  def corpusDir: String = s"$WorkDir/corpus"

  // ---- path model ------------------------------------------------------

  /** Distinct declared xpaths in first-appearance order = pid space. */
  lazy val paths: Vector[String] = Core238.vars.flatMap(_.xpaths).distinct.toVector
  lazy val pathId: Map[String, Int] = paths.zipWithIndex.toMap

  private lazy val ftVar = Core238.vars.find(_.name == "FORMTYPE").get
  private lazy val einVar = Core238.vars.find(_.name == "EIN").get
  private lazy val forcedFt: Set[String] = ftVar.xpaths.toSet
  private lazy val forcedEin: Set[String] = einVar.xpaths.toSet

  def segs(p: String): Seq[String] = graft.engine.Extract.toSegments(p)

  /** A path is a branch when another declared path strictly extends it
    * (its element parses as a struct, not a string leaf).
    */
  lazy val isBranch: Map[String, Boolean] = {
    val allSegs = (paths ++ SchemaBuild.headerPaths).map(segs)
    paths.map { p =>
      val s = segs(p)
      p -> allSegs.exists(o => o.length > s.length && o.startsWith(s))
    }.toMap
  }

  /** Paths at-or-under p — element presence = any of them emitted. */
  def pathsAtOrUnder(p: String): Seq[String] = {
    val s = segs(p)
    paths.filter(q => segs(q).startsWith(s))
  }

  /** Which form types admit this path's subtree; None = any form. */
  def admits(p: String): Option[String] =
    if (p.contains("/IRS990/")) Some("990")
    else if (p.contains("/IRS990EZ/")) Some("990EZ")
    else if (p.contains("/IRS990PF/")) Some("990PF")
    else None

  def formType(i: Int): String = (i % 3) match {
    case 0 => "990"; case 1 => "990EZ"; case _ => "990PF"
  }

  def emitted(p: String, i: Int): Boolean =
    if (forcedEin(p) || forcedFt(p)) true
    else admits(p).forall(_ == formType(i)) && (i + pathId(p)) % 3 != 0

  def value(p: String, i: Int): String =
    if (forcedEin(p)) i.toString
    else if (forcedFt(p)) formType(i)
    else ((i.toLong * 7 + pathId(p).toLong * 13) % 100000).toString

  /** Static invariant: struct-valued paths may only feed vars where
    * raw nullity alone decides the output (label recodes).
    */
  def validate(): Unit =
    Core238.vars.foreach { v =>
      if (v.xpaths.exists(isBranch))
        require(v.label.isDefined,
          s"${v.name}: branch path feeds a value-sensitive extraction")
    }

  // ---- corpus generator ------------------------------------------------

  private final class Elem {
    val children = mutable.LinkedHashMap.empty[String, Elem]
    val attrs = mutable.LinkedHashMap.empty[String, String]
    var text: Option[String] = None
    def child(name: String): Elem = children.getOrElseUpdate(name, new Elem)
  }

  def docXml(i: Int): String = {
    validate()
    val root = new Elem
    def insert(segments: Seq[String], v: String): Unit = {
      val (parents, last) = (segments.init, segments.last)
      val parent = parents.foldLeft(root)(_ child _)
      if (last.startsWith("@")) parent.attrs(last.stripPrefix("@")) = v
      else parent.child(last).text = Some(v)
    }
    paths.foreach(p => if (emitted(p, i)) insert(segs(p), value(p, i)))
    // schedule-root flags (kind=sched): element presence markers
    Core238.vars.filter(_.kind == "sched").foreach { v =>
      if ((i + v.idx) % 5 == 0)
        insert(Seq("ReturnData", "IRS990Schedule" + v.name.stripPrefix("SCHED")), "X")
    }
    val sb = new StringBuilder
    def render(name: String, e: Elem): Unit = {
      sb.append('<').append(name)
      e.attrs.foreach { case (a, v) => sb.append(' ').append(a).append("=\"").append(v).append('"') }
      sb.append('>')
      e.text.foreach(sb.append(_))
      e.children.foreach { case (n, c) => render(n, c) }
      sb.append("</").append(name).append('>')
    }
    sb.append("<?xml version=\"1.0\" encoding=\"utf-8\"?>\n")
    sb.append("<Return returnVersion=\"2014v5.0\" xmlns=\"http://www.irs.gov/efile\">")
    root.children.foreach { case (n, c) => render(n, c) }
    sb.append("</Return>")
    sb.toString
  }

  def writeCorpus(): Unit = {
    val dir = Paths.get(corpusDir)
    if (Files.exists(dir)) {
      val s = Files.walk(dir)
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.delete(p))
      finally s.close()
    }
    Files.createDirectories(dir)
    (0 until NDocs).foreach { i =>
      Files.writeString(dir.resolve(s"${i}_public.xml"), docXml(i))
    }
  }

  // ---- DuckDB oracle ---------------------------------------------------

  private def q(s: String): String = s.replace("'", "''")

  private def admitsSql(p: String): String =
    admits(p).map(ft => s"ft = '$ft' AND ").getOrElse("")

  /** Raw-extraction prediction for one path (NULL when not emitted). */
  private def pathSql(p: String): String =
    if (forcedEin(p)) "CAST(doc_id AS VARCHAR)"
    else if (forcedFt(p)) "ft"
    else if (isBranch(p)) {
      // struct value: any marker; consumers are label-recodes (nullity only)
      val present = pathsAtOrUnder(p)
        .map(c => s"(${admitsSql(c)}(doc_id + ${pathId(c)}) % 3 <> 0)")
        .mkString(" OR ")
      s"CASE WHEN $present THEN 'X' END"
    } else
      s"CASE WHEN ${admitsSql(p)}(doc_id + ${pathId(p)}) % 3 <> 0" +
        s" THEN CAST((doc_id * 7 + ${pathId(p).toLong * 13}) % 100000 AS VARCHAR) END"

  private def rawSql(v: CoreVar): String = v.kind match {
    case "sched" =>
      val flag = s"(doc_id + ${v.idx}) % 5 = 0"
      val root = Seq("ReturnData", "IRS990Schedule" + v.name.stripPrefix("SCHED"))
      val children = paths.filter(p => segs(p).startsWith(root))
        .map(c => s"(${admitsSql(c)}(doc_id + ${pathId(c)}) % 3 <> 0)")
      (flag +: children).mkString("(", " OR ", ")")
    case "url" =>
      s"'file://$corpusDir/' || CAST(doc_id AS VARCHAR) || '_public.xml'"
    case _ =>
      v.xpaths.map(pathSql) match {
        case Seq(one) => one
        case many     => many.mkString("COALESCE(", ", ", ")")
      }
  }

  private def applyRuleSql(x: String, rule: String): String = rule match {
    case "zeroALL" => s"COALESCE($x, '0')"
    case "zeroPC"  => s"CASE WHEN ft = '990' THEN COALESCE($x, '0') ELSE $x END"
    case "zeroEZ"  => s"CASE WHEN ft = '990EZ' THEN COALESCE($x, '0') ELSE $x END"
    case _         => x
  }

  /** Mirrors [[Core238.ruleColumns]] pass for pass, over predicted raws. */
  def oracleSql: String = {
    validate()
    val rawCols = Core238.vars.filter(_.kind != "collapse")
      .map(v => s"${rawSql(v)} AS R_${v.name}")
    // pass 1 (independent) over the raw CTE
    val pass1 = Core238.vars.flatMap { v =>
      val e = v.kind match {
        case "scalar" =>
          val labeled = v.label match {
            case Some(l) => s"CASE WHEN R_${v.name} IS NOT NULL THEN '${q(l)}' END"
            case None    => s"R_${v.name}"
          }
          Some(applyRuleSql(labeled, v.rule))
        case "multi"         => Some(s"COALESCE(R_${v.name}, '')")
        case "sched" | "url" => Some(s"R_${v.name}")
        case _               => None
      }
      e.map(sql => s"$sql AS ${v.name}")
    }
    // passes 2+3 in the final select, referencing pass-1 names
    val finalCols = Core238.vars.map { v =>
      v.kind match {
        case "condsum" =>
          val sum = v.parts
            .map(p => s"COALESCE(CAST($p AS DECIMAL(38,0)), 0)")
            .mkString(" + ")
          val c = s"CASE WHEN ft = '990EZ' THEN R_${v.name}" +
            s" WHEN ft = '990' THEN CAST(($sum) AS VARCHAR) END"
          s"${applyRuleSql(c, v.rule)} AS ${v.name}"
        case "collapse" =>
          val pasted = v.parts.map(p => s"COALESCE($p, 'NA')")
            .mkString(s" || '${q(v.sep)}' || ")
          s"NULLIF(REPLACE($pasted, 'NA', ''), '${q(v.naToken)}') AS ${v.name}"
        case _ => v.name
      }
    }
    s"""WITH d AS (
       |  SELECT range AS doc_id,
       |         CASE CAST(range % 3 AS INTEGER) WHEN 0 THEN '990' WHEN 1 THEN '990EZ' ELSE '990PF' END AS ft
       |  FROM range($NDocs)
       |), r AS (
       |  SELECT doc_id, ft,
       |  ${rawCols.mkString(",\n  ")}
       |  FROM d
       |), s AS (
       |  SELECT *,
       |  ${pass1.mkString(",\n  ")}
       |  FROM r
       |)
       |SELECT
       |  ${finalCols.mkString(",\n  ")}
       |FROM s""".stripMargin
  }

  // ---- registered query ------------------------------------------------

  def defs: Seq[QueryDef] = Seq(
    QueryDef.sql("core238_e2e", oracleSql) { (spark, _) =>
      writeCorpus()
      val schema = SchemaBuild.sparseSchema(Nil,
        SchemaBuild.headerPaths ++ Core238.declaredPaths)
      Core238.build(Ingest.readReturns(spark, corpusDir, Some(schema)))
    }
  )
}
