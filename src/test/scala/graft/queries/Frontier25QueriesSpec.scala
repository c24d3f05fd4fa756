package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the twenty-fifth frontier batch. */
class Frontier25QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("v20 confusion matrix conserves vectors and beats chance on clustered labels") {
    val rows = run("v20_centroid_classify").collect()
    val total = rows.map(_.getLong(2)).sum
    val nVecs = graft.Tables.embeddings(spark, sf("sf0.01")).count()
    assert(total == nVecs)
    // accuracy: diagonal share — embeddings are label-clustered by
    // construction, so nearest-centroid must beat the 10% chance floor
    val correct = rows.filter(r => r.getInt(0) == r.getInt(1)).map(_.getLong(2)).sum
    val acc = correct.toDouble / total
    assert(acc > 0.2, s"nearest-centroid accuracy $acc at chance level — classifier broken")
    // deterministic re-run
    val again = run("v20_centroid_classify").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sortBy(t => (t._1, t._2))
    assert(again.sameElements(
      rows.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).sortBy(t => (t._1, t._2))))
  }

  test("t42 sentence stats: totals conserve and ratios consistent") {
    val rows = run("t42_sentence_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(5) >= 1) // max sentences per doc
      val spd = r.getDouble(3)
      assert(spd > 0 && spd <= r.getLong(5).toDouble)
      if (!r.isNullAt(4)) assert(r.getDouble(4) > 0)
    }
    val nDocs = rows.map(_.getLong(1)).sum
    assert(nDocs == graft.Tables.documents(spark, sf("sf0.01")).count())
  }
}
