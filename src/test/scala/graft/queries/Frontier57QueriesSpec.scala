package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the fifty-seventh frontier batch. */
class Frontier57QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a117 trend: T_N identity and sign agreement with z2") {
    val rows = run("a117_trend_test").collect()
    assert(rows.length == 30)
    rows.foreach { r =>
      val (n, a, tn) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(a >= 0 && a <= n)
      if (!r.isNullAt(4)) {
        val z2 = r.getLong(4)
        assert((z2 >= 0) == (tn >= 0) || tn == 0, "z2 carries T_N's sign")
        assert(math.abs(z2) <= 400L * 1000000L, "|z| <= 20 sanity")
      }
    }
    // user-days conserved across doses
    val userDays = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("ts").cast("date"), col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == userDays)
  }

  test("t56 novelty: doc 1 fully novel within prefix order; monotone budget") {
    val rows = run("t56_ngram_novelty").collect()
    assert(rows.nonEmpty)
    val first = rows.minBy(_.getLong(0))
    assert(first.getLong(1) == first.getLong(2),
      "the earliest doc's grams are all first occurrences")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getLong(3) == r.getLong(2) * 1000 / r.getLong(1))
    }
    // every gram's novelty is attributed exactly once across the corpus
    val totalNovel = rows.map(_.getLong(2)).sum
    val distinctGrams = graft.Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id"),
        explode(expr("""transform(sequence(1, size(regexp_extract_all(lower(text), '\\S+', 0)) - 4),
          i -> concat_ws(' ', slice(regexp_extract_all(lower(text), '\\S+', 0), i, 5)))"""))
          .as("g"))
      .select(graft.functions.TextFunctions.rollingFingerprint(col("g")))
      .distinct().count()
    assert(totalNovel == distinctGrams)
  }

  test("ev73s stream as-of: matches the batch as-of join row for row") {
    val out = run("ev73s_stream_asof").collect()
    // batch oracle twin computed in-plan: latest signup at or before
    import org.apache.spark.sql.expressions.Window
    val d = sf("sf0.01")
    val ev = graft.Tables.events(spark, d)
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("sts"), col("event_id").as("sid"),
        floor(col("value") * 100).cast("long").as("dim_cents"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100).cast("long").as("fact_cents"))
    val joined = p.join(s, Seq("user_id"), "left")
      .filter(col("sts").isNull || col("sts") <= col("ts"))
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("user_id"), col("event_id"))
        .orderBy(col("sts").desc_nulls_last, col("sid").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("fact_cents"), col("dim_cents"))
    // purchases with NO prior signup drop out of the filter-join above;
    // re-add them with null dim
    val matchedKeys = joined.select(col("event_id")).collect().map(_.getLong(0)).toSet
    val expected = joined.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet ++
      p.collect().filter(r => !matchedKeys.contains(r.getLong(2)))
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), None)).toSet
    val got = out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
    assert(got == expected)
  }
}
