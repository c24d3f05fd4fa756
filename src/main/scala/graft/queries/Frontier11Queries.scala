package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Eleventh frontier batch: Spearman rank trend with tie-free total
  * orders (exact closed form), drawdown recovery durations, and
  * character-bigram entropy per language.
  */
object Frontier11Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A44: Spearman rank trend per user ---------------------------------
    // Is a user's event value trending with time? Spearman's ρ on two
    // TIE-FREE total orders (rank by (value units, event_id) vs rank
    // by (ts, event_id) — the event_id tie-break makes both
    // permutations, so the closed form ρ = 1 − 6Σd²/(n(n²−1)) is
    // EXACT): Σd² is an exact integer, the denominator an exact
    // integer, ρ is ONE division. Two partitioned windows share the
    // per-user sort; n > 1 guard avoids the n(n²−1)=0 pole.
    QueryDef.sql(
      "a44_spearman_trend",
      """WITH v AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS x
        |  FROM events),
        |r AS (
        |  SELECT user_id,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS BIGINT) AS rt,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY x, event_id)
        |      AS BIGINT) AS rv
        |  FROM v),
        |g AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum((rt - rv) * (rt - rv)) AS BIGINT) AS d2
        |  FROM r GROUP BY user_id)
        |SELECT user_id, n, d2,
        |  1 - CAST(6 * d2 AS DOUBLE) / CAST(n * (n * n - 1) AS DOUBLE) AS rho
        |FROM g WHERE n > 1""".stripMargin) { (s, d) =>
      val v = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          (col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long").as("x"))
      val wT = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wV = Window.partitionBy(col("user_id")).orderBy(col("x"), col("event_id"))
      val r = v.select(col("user_id"),
        row_number().over(wT).cast("long").as("rt"),
        row_number().over(wV).cast("long").as("rv"))
      val g = r.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum((col("rt") - col("rv")) * (col("rt") - col("rv"))).as("d2"))
      g.filter(col("n") > 1)
        .select(col("user_id"), col("n"), col("d2"),
          (lit(1) - (lit(6) * col("d2")).cast("double")
            / (col("n") * (col("n") * col("n") - 1)).cast("double")).as("rho"))
    },

    // ---- EV40: time underwater (drawdown recovery durations) ---------------
    // w9 reports HOW DEEP the drawdown goes; this reports HOW LONG —
    // the longest run of consecutive events where the cumulative
    // series sits strictly below its running peak ("underwater").
    // Gaps-and-islands over the underwater flag: island id = running
    // count of surface events (cum == peak), so each underwater run
    // keys to the surface event that preceded it. All integer units,
    // two shared-sort windows + one re-aggregate.
    QueryDef.sql(
      "ev40_time_underwater",
      """WITH v AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS units
        |  FROM events),
        |c0 AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(sum(units) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS BIGINT) AS cum
        |  FROM v),
        |c AS (
        |  SELECT user_id, ts, event_id, cum,
        |    CAST(max(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS BIGINT) AS peak
        |  FROM c0),
        |f AS (
        |  SELECT user_id,
        |    CASE WHEN cum < peak THEN 1 ELSE 0 END AS uw,
        |    CAST(sum(CASE WHEN cum = peak THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS island
        |  FROM c),
        |runs AS (
        |  SELECT user_id, island, CAST(sum(uw) AS BIGINT) AS run_len
        |  FROM f GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(max(run_len) AS BIGINT) AS max_underwater_run,
        |  CAST(sum(run_len) AS BIGINT) AS total_underwater_events
        |FROM runs GROUP BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val units = (col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long")
      val c = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), units.as("units"))
        .withColumn("cum", sum(col("units")).over(w))
        .withColumn("peak", max(col("cum")).over(w))
      val f = c.select(col("user_id"), col("ts"), col("event_id"),
          when(col("cum") < col("peak"), 1L).otherwise(0L).as("uw"),
          when(col("cum") === col("peak"), 1L).otherwise(0L).as("surf"))
        .withColumn("island", sum(col("surf")).over(w))
      f.groupBy(col("user_id"), col("island"))
        .agg(sum(col("uw")).as("run_len"))
        .groupBy(col("user_id"))
        .agg(max(col("run_len")).as("max_underwater_run"),
          sum(col("run_len")).as("total_underwater_events"))
    },

    // ---- T35: character-bigram entropy per language ------------------------
    // The language-model-free fluency signal: Shannon entropy of the
    // character-bigram distribution per lang. Counts are exact off one
    // explode (aligned slice + zip_with, strictly linear — never
    // element_at-in-transform); each p is an exact integer ratio; the
    // Σ −p·ln p folds in bigram order and rounds to 6 dp (the libm-ulp
    // convention). High entropy ≈ diverse character usage; collapsed
    // entropy flags boilerplate/degenerate corpora.
    QueryDef.sql(
      "t35_bigram_entropy",
      """WITH ch AS (
        |  SELECT lang, lower(text) AS t FROM documents),
        |bg AS (
        |  SELECT lang, unnest(list_transform(range(1, len(t)),
        |    i -> substr(t, CAST(i AS INTEGER), 2))) AS b
        |  FROM ch WHERE len(t) >= 2),
        |cnt AS (
        |  SELECT lang, b, CAST(count(*) AS BIGINT) AS n
        |  FROM bg GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS tot FROM cnt GROUP BY 1),
        |terms AS (
        |  SELECT c.lang, c.b,
        |    -(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE))
        |      * ln(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)) AS term
        |  FROM cnt c JOIN tot t ON c.lang = t.lang)
        |SELECT lang,
        |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(term ORDER BY b)), (a, x) -> a + x), 6) AS entropy
        |FROM terms GROUP BY lang""".stripMargin) { (s, d) =>
      // aligned slices: bigram i = substr(t, i, 2) for i in 1..len-1,
      // via zip_with over two shifted character arrays
      val chars = split(col("t"), "")
      val n = size(chars)
      val bigrams = zip_with(
        slice(chars, lit(1), greatest(n - 1, lit(0))),
        slice(chars, lit(2), greatest(n - 1, lit(0))),
        (a, b) => concat(a, b))
      val bg = Tables.documents(s, d)
        .select(col("lang"), lower(col("text")).as("t"))
        .filter(length(col("t")) >= 2)
        .select(col("lang"), explode(bigrams).as("b"))
      val cnt = bg.groupBy(col("lang"), col("b")).agg(count(lit(1)).as("n"))
      val tot = cnt.groupBy(col("lang")).agg(sum(col("n")).as("tot"))
      val p = col("n").cast("double") / col("tot").cast("double")
      val terms = cnt.join(tot, "lang")
        .select(col("lang"), col("b"), (-p * log(p)).as("term"))
      terms.groupBy(col("lang"))
        .agg(round(aggregate(
          transform(sort_array(collect_list(struct(col("b"), col("term")))),
            x => x.getField("term")),
          lit(0.0), (acc, x) => acc + x), 6).as("entropy"))
    }
  )
}
