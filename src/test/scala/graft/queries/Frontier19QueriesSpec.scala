package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the nineteenth frontier batch. */
class Frontier19QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("c20 group split: covers the corpus and never splits a near-dup group") {
    val rows = run("c20_group_split").collect()
    val nDocs = graft.Tables.documents(spark, sf("sf0.01")).count()
    assert(rows.length == nDocs)
    // the leakage invariant: each group maps to exactly one split
    val groupSplits = rows.groupBy(_.getLong(1)).view
      .mapValues(_.map(_.getString(2)).distinct.length)
    assert(groupSplits.values.forall(_ == 1), "a near-dup group spans two splits")
    // multi-doc groups exist at this scale (else the test is vacuous)
    val multi = rows.groupBy(_.getLong(1)).count { case (_, g) => g.length > 1 }
    assert(multi > 0)
    // rough 80/10/10 shape
    val frac = rows.count(_.getString(2) == "train").toDouble / nDocs
    assert(frac > 0.6 && frac < 0.95)
  }

  test("ev47 lifecycle ledger balances week over week") {
    val rows = run("ev47_lifecycle_states").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val weeks = rows.map(_._1).distinct.sorted
    def n(w: Long, s: String) = rows.collectFirst {
      case (`w`, `s`, c) => c
    }.getOrElse(0L)
    // active(w) = new + retained + resurrected; the ledger identity:
    // active(w) - retained(w+1) - churned(w+1) counts users whose week-w
    // activity did not continue, i.e. active(w) = retained(w+1) + churned(w+1)
    weeks.dropRight(1).foreach { w =>
      val active = n(w, "new") + n(w, "retained") + n(w, "resurrected")
      assert(active == n(w + 1, "retained") + n(w + 1, "churned"),
        s"week $w: active $active != retained+churned of week ${w + 1}")
    }
    // every user appears exactly once as 'new'
    val newTotal = rows.filter(_._2 == "new").map(_._3).sum
    val nUsers = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id")).distinct().count()
    assert(newTotal == nUsers)
  }

  test("a57 entropy: bounded by ln(n_distinct), near-uniform columns near the bound") {
    val rows = run("a57_column_entropy").collect()
    assert(rows.length == 7)
    rows.foreach { r =>
      val h = r.getDouble(3)
      val bound = math.log(r.getLong(1).toDouble)
      assert(h >= -1e-9 && h <= bound + 1e-6,
        s"${r.getString(0)}: H=$h outside [0, ln(${r.getLong(1)})=$bound]")
    }
    // event_type is near-uniform by construction → entropy close to ln(5)
    val ev = rows.find(_.getString(0) == "events.event_type").get
    assert(math.abs(ev.getDouble(3) - math.log(5.0)) < 0.01)
  }
}
