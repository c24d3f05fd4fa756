package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based checks of the production-rule algebra (SURVEY §5
  * plan item b): each rule is validated against a driver-side
  * reference implementation over generated row batches.
  */
class RulesPropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = SCTest.Parameters.default.withMinSuccessfulTests(8)
  private def check(p: Prop): Unit = {
    val r = SCTest.check(params, p)
    assert(r.passed, r.status.toString)
  }

  private val amount: Gen[Option[String]] =
    Gen.option(Gen.chooseNum(0L, 999999L).map(_.toString))
  private val form: Gen[String] = Gen.oneOf("990", "990EZ")

  test("zeroAll: never null, identity on non-null") {
    check(Prop.forAll(Gen.listOfN(60, amount)) { vals =>
      val got = vals.toDF("v").select(Rules.zeroAll($"v")).as[String].collect().toSeq
      got == vals.map(_.getOrElse("0"))
    })
  }

  test("zeroPC touches only FORMTYPE=990 rows") {
    check(Prop.forAll(Gen.listOfN(60, Gen.zip(amount, form))) { rows =>
      val got = rows.toDF("v", "ft")
        .select(Rules.zeroPC($"v", $"ft")).as[Option[String]].collect().toSeq
      got == rows.map {
        case (v, "990") => Some(v.getOrElse("0"))
        case (v, _) => v
      }
    })
  }

  test("naSum: null iff all inputs null, else sum of non-null") {
    check(Prop.forAll(Gen.listOfN(40, Gen.zip(amount, amount, amount))) { rows =>
      val got = rows.toDF("a", "b", "c")
        .select(Rules.naSum(Seq($"a", $"b", $"c"))).as[Option[Double]].collect().toSeq
      got == rows.map { case (a, b, c) =>
        val xs = Seq(a, b, c).flatten.map(_.toDouble)
        if (xs.isEmpty) None else Some(xs.sum)
      }
    })
  }

  test("checkboxCollapse: concat of non-null parts; null iff none present") {
    val label: Gen[Option[String]] = Gen.option(Gen.oneOf("Corp", "Trust", "Assoc"))
    check(Prop.forAll(Gen.listOfN(40, Gen.zip(label, label))) { rows =>
      val got = rows.toDF("a", "b")
        .select(Rules.checkboxCollapse(Seq($"a", $"b"))).as[Option[String]].collect().toSeq
      got == rows.map { case (a, b) =>
        val s = Seq(a, b).flatten.mkString("")
        if (s.isEmpty) None else Some(s)
      }
    })
  }

  test("taxYear: December keeps the year, all other months shift back") {
    val period: Gen[String] = for {
      y <- Gen.chooseNum(2008, 2020); m <- Gen.chooseNum(1, 12)
    } yield f"$y$m%02d"
    check(Prop.forAll(Gen.listOfN(60, period)) { ps =>
      val got = ps.toDF("p").select(Rules.taxYear($"p")).as[Int].collect().toSeq
      got == ps.map(p => if (p.endsWith("12")) p.take(4).toInt else p.take(4).toInt - 1)
    })
  }

  test("asBoolean normalizes era encodings; garbage → null") {
    val enc: Gen[String] = Gen.oneOf("true", "false", "1", "0", "X", "x", "junk", "")
    check(Prop.forAll(Gen.listOfN(40, enc)) { vs =>
      val got = vs.toDF("v").select(Rules.asBoolean($"v")).as[Option[Boolean]].collect().toSeq
      got == vs.map {
        case "true" | "1" | "X" | "x" => Some(true)
        case "false" | "0" => Some(false)
        case _ => None
      }
    })
  }
}
