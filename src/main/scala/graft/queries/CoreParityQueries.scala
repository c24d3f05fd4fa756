package graft.queries

import graft.Tables
import graft.engine.{Core238, CoreVar}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Oracle-checked parity harness for the curated CORE-238 rule layer.
  *
  * The registered query synthesizes, per `documents.doc_id`, a
  * deterministic "raw extraction state" (which fields are present on
  * which form type, and their values) and pushes it through
  * [[Core238.ruleColumns]] — the exact Column algebra the XML build
  * uses. The DuckDB oracle replicates the synthesis AND the reference
  * rule semantics (zeroALL/zeroPC/zeroEZ `R:416-476`, checkbox recodes,
  * paste-gsub collapses `R:618-621,668-671,743-746,1868-1870`,
  * conditional sums `R:1032-1081,1290-1305,1515-1545`) in generated
  * SQL, so every one of the 237 columns is hash-checked bit-exactly.
  * XML extraction itself is fixture-tested in Core238Spec.
  *
  * Synthesis rules (identical on both sides):
  *  - form type: doc_id % 3 → 990 / 990EZ / 990PF
  *  - a variable's raw field is present iff its xpath scope admits the
  *    form type AND (doc_id + varIdx) % 3 != 0
  *  - raw value: (doc_id * 7 + varIdx * 13) % 100000 as a string
  *  - schedule flags: (doc_id + varIdx) % 5 == 0
  */
object CoreParityQueries {

  /** Which form types carry this variable's raw field, from its xpath
    * spellings: IRS990-only → 990; IRS990EZ-only → 990EZ; both → both;
    * header/schedule paths → any form (present even on 990PF).
    */
  private def formsPred(v: CoreVar): Option[Seq[String]] = {
    val pc = v.xpaths.exists(_.contains("/IRS990/"))
    val ez = v.xpaths.exists(_.contains("/IRS990EZ/"))
    if (pc && ez) Some(Seq("990", "990EZ"))
    else if (pc) Some(Seq("990"))
    else if (ez) Some(Seq("990EZ"))
    else None // ReturnHeader / IRS990ScheduleC paths: any form
  }

  private val UrlPrefix = "https://s3.amazonaws.com/irs-form-990/"

  // ---- Spark side -----------------------------------------------------

  private def synthRaw(docId: Column, ft: Column, v: CoreVar): Column = v.name match {
    case "FORMTYPE" => ft
    case "EIN"      => docId.cast("string")
    case _ =>
      v.kind match {
        case "sched" => (docId + lit(v.idx)) % 5 === 0
        case "url"   => concat(lit(UrlPrefix), docId.cast("string"), lit("_public.xml"))
        case "collapse" => lit(null).cast("string") // derived in the rule layer
        case _ =>
          val formOk = formsPred(v).map(fs => ft.isin(fs: _*)).getOrElse(lit(true))
          val present = formOk && ((docId + lit(v.idx)) % 3 =!= 0)
          when(present, ((docId * 7 + lit(v.idx * 13)) % 100000).cast("string"))
      }
  }

  // ---- DuckDB side ----------------------------------------------------

  private def q(s: String): String = s.replace("'", "''")

  private def synthRawSql(v: CoreVar): String = v.name match {
    case "FORMTYPE" => "ft"
    case "EIN"      => "CAST(doc_id AS VARCHAR)"
    case _ =>
      v.kind match {
        case "sched" => s"(doc_id + ${v.idx}) % 5 = 0"
        case "url"   => s"'$UrlPrefix' || CAST(doc_id AS VARCHAR) || '_public.xml'"
        case "collapse" => "NULL"
        case _ =>
          val formOk = formsPred(v) match {
            case Some(Seq(one))   => s"ft = '$one'"
            case Some(fs)         => fs.map(f => s"'$f'").mkString("ft IN (", ", ", ")")
            case None             => "TRUE"
          }
          s"CASE WHEN $formOk AND (doc_id + ${v.idx}) % 3 <> 0" +
            s" THEN CAST((doc_id * 7 + ${v.idx * 13}) % 100000 AS VARCHAR) END"
      }
  }

  private def applyRuleSql(x: String, rule: String): String = rule match {
    case "zeroALL" => s"COALESCE($x, '0')"
    case "zeroPC"  => s"CASE WHEN ft = '990' THEN COALESCE($x, '0') ELSE $x END"
    case "zeroEZ"  => s"CASE WHEN ft = '990EZ' THEN COALESCE($x, '0') ELSE $x END"
    case _         => x
  }

  /** The generated oracle: mirrors [[Core238.ruleColumns]] pass for pass. */
  def oracleSql: String = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    Core238.vars.foreach { v =>
      v.kind match {
        case "scalar" =>
          val raw = synthRawSql(v)
          val labeled = v.label match {
            case Some(l) => s"CASE WHEN ($raw) IS NOT NULL THEN '${q(l)}' END"
            case None    => raw
          }
          out(v.name) = applyRuleSql(labeled, v.rule)
        case "multi"         => out(v.name) = s"COALESCE(${synthRawSql(v)}, '')"
        case "sched" | "url" => out(v.name) = synthRawSql(v)
        case _               => ()
      }
    }
    Core238.vars.filter(_.kind == "condsum").foreach { v =>
      val sum = v.parts
        .map(p => s"COALESCE(CAST(${out(p)} AS DECIMAL(38,0)), 0)")
        .mkString(" + ")
      val c = s"CASE WHEN ft = '990EZ' THEN ${synthRawSql(v)}" +
        s" WHEN ft = '990' THEN CAST(($sum) AS VARCHAR) END"
      out(v.name) = applyRuleSql(c, v.rule)
    }
    Core238.vars.filter(_.kind == "collapse").foreach { v =>
      val pasted = v.parts
        .map(p => s"COALESCE(${out(p)}, 'NA')")
        .mkString(s" || '${q(v.sep)}' || ")
      out(v.name) = s"NULLIF(REPLACE($pasted, 'NA', ''), '${q(v.naToken)}')"
    }
    val cols = out.map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN '990' WHEN 1 THEN '990EZ' ELSE '990PF' END AS ft
       |  FROM documents
       |)
       |SELECT doc_id,
       |  $cols
       |FROM d""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    QueryDef.sql("core238_rules", oracleSql) { (s, d) =>
      val docs = Tables.documents(s, d).select("doc_id")
      val docId = col("doc_id")
      val ft = when(docId % 3 === 0, "990")
        .when(docId % 3 === 1, "990EZ")
        .otherwise("990PF")
      val raw: Map[String, Column] =
        Core238.vars.map(v => v.name -> synthRaw(docId, ft, v)).toMap
      val cols = Core238.ruleColumns(raw, ft).map { case (n, c) => c.as(n) }
      docs.select(docId +: cols: _*)
    }
  )
}
