package graft.queries

import graft.SparkSpec
import graft.engine.Core238

/** Spark-side verification of the end-to-end CORE-238 corpus harness:
  * recompute the expected post-rule value for every (doc, var) from the
  * generator's closed-form parameters IN SCALA and compare with what
  * the real parse → extract → rules path produced. The driver's DuckDB
  * oracle repeats the same check independently (core238_e2e).
  */
class Core238E2ESpec extends SparkSpec {

  private def predictRaw(v: graft.engine.CoreVar, i: Int): Option[String] = v.kind match {
    case "sched" => None
    case "url" =>
      Some(s"file://${Core238E2E.corpusDir}/${i}_public.xml")
    case _ =>
      v.xpaths.iterator.flatMap { p =>
        if (Core238E2E.isBranch(p)) {
          val present = Core238E2E.pathsAtOrUnder(p).exists(Core238E2E.emitted(_, i))
          if (present) Some("STRUCT") else None
        } else if (Core238E2E.emitted(p, i)) Some(Core238E2E.value(p, i))
        else None
      }.nextOption()
  }

  private def predictSched(v: graft.engine.CoreVar, i: Int): Boolean = {
    val root = Seq("ReturnData", "IRS990Schedule" + v.name.stripPrefix("SCHED"))
    (i + v.idx) % 5 == 0 ||
      Core238E2E.paths.exists(p =>
        Core238E2E.segs(p).startsWith(root) && Core238E2E.emitted(p, i))
  }

  private def applyRule(x: Option[String], rule: String, ft: String): Option[String] = rule match {
    case "zeroALL" => x.orElse(Some("0"))
    case "zeroPC"  => if (ft == "990") x.orElse(Some("0")) else x
    case "zeroEZ"  => if (ft == "990EZ") x.orElse(Some("0")) else x
    case _         => x
  }

  /** Full rule-layer prediction for one doc: var name → Any (String or Boolean). */
  private def predictDoc(i: Int): Map[String, Any] = {
    val ft = Core238E2E.formType(i)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Option[String]]
    Core238.vars.foreach { v =>
      v.kind match {
        case "scalar" =>
          val raw = predictRaw(v, i)
          val labeled = v.label match {
            case Some(l) => raw.map(_ => l)
            case None    => raw
          }
          out(v.name) = applyRule(labeled, v.rule, ft)
        case "multi" => out(v.name) = Some(predictRaw(v, i).getOrElse(""))
        case "url"   => out(v.name) = predictRaw(v, i)
        case _       => ()
      }
    }
    Core238.vars.filter(_.kind == "condsum").foreach { v =>
      val c = ft match {
        case "990EZ" => predictRaw(v, i)
        case "990" =>
          Some(v.parts.map(p => out(p).map(BigInt(_)).getOrElse(BigInt(0))).sum.toString)
        case _ => None
      }
      out(v.name) = applyRule(c, v.rule, ft)
    }
    Core238.vars.filter(_.kind == "collapse").foreach { v =>
      val pasted = v.parts.map(p => out(p).getOrElse("NA")).mkString(v.sep)
      val scrubbed = pasted.replace("NA", "")
      out(v.name) = if (scrubbed == v.naToken) None else Some(scrubbed)
    }
    val scheds = Core238.vars.filter(_.kind == "sched")
      .map(v => v.name -> (predictSched(v, i): Any))
    out.toMap.map { case (k, v) => k -> (v.orNull: Any) } ++ scheds
  }

  test("e2e corpus round trip matches closed-form prediction on every doc") {
    val df = Core238E2E.defs.head.fn(spark, sf())
    val rows = df.collect()
    assert(rows.length == Core238E2E.NDocs)
    val byEin = rows.map(r => r.getString(r.fieldIndex("EIN")).toInt -> r).toMap
    assert(byEin.size == Core238E2E.NDocs)
    val names = df.columns
    var checked = 0
    (0 until Core238E2E.NDocs).foreach { i =>
      val row = byEin(i)
      val expect = predictDoc(i)
      names.foreach { n =>
        val got = row.get(row.fieldIndex(n))
        expect(n) match {
          case "STRUCT" => // branch-path label markers never surface; labels covered above
          case e =>
            assert(got == e, s"doc=$i var=$n got=$got expected=$e")
            checked += 1
        }
      }
    }
    // 300 docs × 237 vars, all compared
    assert(checked == Core238E2E.NDocs * names.length)
  }

  test("no document quarantined, EIN/FORMTYPE forced on every doc") {
    val df = Core238E2E.defs.head.fn(spark, sf())
    val fts = df.groupBy("FORMTYPE").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fts == Map("990" -> 100L, "990EZ" -> 100L, "990PF" -> 100L))
  }

  test("oracle SQL mentions every variable exactly as a column") {
    val sql = Core238E2E.oracleSql
    Core238.vars.foreach(v => assert(sql.contains(s" AS ${v.name}"), v.name))
  }
}
