package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Forty-third frontier batch: Bradley–Terry preference ranking,
  * distributed weighted median, leave-one-out target encoding.
  */
object Frontier43Queries {

  // Three unrolled Bradley–Terry fixed-point rounds in integer
  // nano-units (the d7/t47 discipline — iterative MLE made hash-
  // checkable): π'_i = W_i·10¹⁸ div Σ_j (n_ij·10¹⁸ div (π_i + π_j)).
  private val btIters: String = (1 to 3).map { k =>
    s"""r$k AS (
       |  SELECT w.team, CAST((w.wins * 1000000000000000)
       |    // coalesce(dn.denom, 1) AS BIGINT) AS pi
       |  FROM wins w LEFT JOIN (
       |    SELECT p.a AS team,
       |      CAST(sum((p.n * 1000000000000000) // (ra.pi + rb.pi)) AS BIGINT)
       |        AS denom
       |    FROM pairs p JOIN r${k - 1} ra ON p.a = ra.team
       |    JOIN r${k - 1} rb ON p.b = rb.team
       |    GROUP BY 1) dn ON w.team = dn.team)""".stripMargin
  }.mkString(",\n")

  val defs: Seq[QueryDef] = Seq(

    // ---- A98: Bradley–Terry preference ranking -----------------------------
    // Which event stream "wins" the day? Daily revenue comparisons
    // give pairwise win counts between the five types; Bradley–Terry
    // turns them into strengths. The MLE fixed point is iterative —
    // normally un-oracle-able — but three unrolled rounds in integer
    // nano-unit division (every step an exact BIGINT div, the d7
    // discipline) are bit-reproducible in both engines. Match grain is
    // calendar×pair-bounded; the recursion runs on a 5-row table.
    QueryDef.sql(
      "a98_bradley_terry",
      s"""WITH daily AS (
         |  SELECT event_type AS team, CAST(ts AS DATE) AS day,
         |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
         |  FROM events GROUP BY 1, 2),
         |duel AS (
         |  SELECT a.team AS wa, b.team AS wb
         |  FROM daily a JOIN daily b
         |    ON a.day = b.day AND a.team < b.team AND a.cents <> b.cents),
         |matches AS (
         |  SELECT wa AS a, wb AS b,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT wa, wb FROM duel UNION ALL SELECT wb, wa FROM duel)
         |  GROUP BY 1, 2),
         |pairs AS (SELECT a, b, n FROM matches),
         |winrows AS (
         |  SELECT d.team, CAST(count(*) AS BIGINT) AS wins FROM (
         |    SELECT a.team
         |    FROM daily a JOIN daily b ON a.day = b.day AND a.team <> b.team
         |    WHERE a.cents > b.cents) d GROUP BY 1),
         |teams AS (SELECT DISTINCT event_type AS team FROM events),
         |wins AS (
         |  SELECT t.team, coalesce(w.wins, 0) AS wins
         |  FROM teams t LEFT JOIN winrows w ON t.team = w.team),
         |r0 AS (SELECT team, CAST(1000000000 AS BIGINT) AS pi FROM wins),
         |$btIters
         |SELECT w.team, w.wins, r3.pi AS pi_nano,
         |  CAST(row_number() OVER (ORDER BY r3.pi DESC, w.team) AS INT) AS rank
         |FROM wins w JOIN r3 ON w.team = r3.team""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type").as("team"), col("ts").cast("date").as("day"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
        .localCheckpoint(true) // feeds several self-joins
      val b = daily.select(col("team").as("tb"), col("day"), col("cents").as("cb"))
      val duel = daily.join(b, Seq("day"))
        .filter(col("team") < col("tb") && col("cents") =!= col("cb"))
        .select(when(col("cents") > col("cb"), col("team")).otherwise(col("tb"))
          .as("winner"),
          col("team").as("wa"), col("tb").as("wb"))
      val matches = duel.select(col("wa").as("a"), col("wb").as("b"))
        .unionByName(duel.select(col("wb").as("a"), col("wa").as("b")))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      val winrows = duel.groupBy(col("winner").as("team"))
        .agg(count(lit(1)).as("wins"))
      val teams = Tables.events(s, d).select(col("event_type").as("team")).distinct()
      val wins = teams.join(winrows, Seq("team"), "left")
        .select(col("team"), coalesce(col("wins"), lit(0L)).as("wins"))
        .localCheckpoint(true)
      var r = wins.select(col("team"), lit(1000000000L).as("pi"))
      (1 to 3).foreach { _ =>
        val ra = r.select(col("team").as("a"), col("pi").as("pa"))
        val rb = r.select(col("team").as("b"), col("pi").as("pb"))
        val denom = matches.join(broadcast(ra), "a").join(broadcast(rb), "b")
          .groupBy(col("a").as("team"))
          .agg(sum(expr("(n * 1000000000000000) div (pa + pb)")).as("denom"))
        r = wins.join(denom, Seq("team"), "left")
          .select(col("team"),
            expr("(wins * 1000000000000000) div coalesce(denom, 1)").cast("long")
              .as("pi"))
          .localCheckpoint(true)
      }
      // team-bounded final rank
      wins.join(r, "team")
        .select(col("team"), col("wins"), col("pi").as("pi_nano"))
        .withColumn("rank",
          row_number().over(Window.orderBy(col("pi_nano").desc, col("team"))).cast("int"))
    },

    // ---- A99: distributed weighted median ----------------------------------
    // The weighted quantile a21/w8's unweighted medians can't give:
    // the user-revenue level below which half the EVENT WEIGHT sits.
    // Scale shape: the c4/c7 two-phase sharded prefix applied to
    // WEIGHTS — range-shard by the sort key (boundaries pinned by
    // localCheckpoint, the ShardedRank gotcha), shard-local weight
    // prefix sums, shard-offset broadcast, then the first row whose
    // cumulative weight crosses ⌈W/2⌉. No unpartitioned window over
    // users; the oracle mirrors with a naive global window.
    QueryDef.sql(
      "a99_weighted_median",
      """WITH u AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS w,
        |    CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS r
        |  FROM events GROUP BY 1),
        |tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw, CAST(count(*) AS BIGINT) AS n
        |  FROM u),
        |cum AS (
        |  SELECT r, w, sum(w) OVER (ORDER BY r, user_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
        |  FROM u)
        |SELECT n AS n_users, tw AS total_weight,
        |  CAST(min(CASE WHEN cw >= (tw + 1) // 2 THEN r END) AS BIGINT)
        |    AS weighted_median_cents
        |FROM cum CROSS JOIN tot GROUP BY n, tw""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d).groupBy(col("user_id"))
        .agg(count(lit(1)).as("w"),
          sum(floor(col("value") * 100).cast("long")).as("r"))
      val tot = u.agg(sum(col("w")).as("tw"), count(lit(1)).as("n"))
      val shards = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
      // two-phase sharded weight prefix (no unpartitioned window over users)
      val ranged = u.repartitionByRange(shards, col("r"), col("user_id"))
        .withColumn("__shard", spark_partition_id())
        .localCheckpoint(true)
      val wLocal = Window.partitionBy(col("__shard")).orderBy(col("r"), col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val local = ranged.withColumn("__lcw", sum(col("w")).over(wLocal))
      val wShard = Window.orderBy(col("__shard"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = ranged.groupBy(col("__shard")).agg(sum(col("w")).as("__swt"))
        .withColumn("__off", coalesce(sum(col("__swt")).over(wShard), lit(0L)))
        .select(col("__shard"), col("__off"))
      val cum = local.join(broadcast(offsets), "__shard")
        .select(col("r"), (col("__lcw") + col("__off")).as("cw"))
      cum.crossJoin(broadcast(tot))
        .groupBy(col("n"), col("tw"))
        .agg(min(when(col("cw") >= expr("(tw + 1) div 2"), col("r")))
          .as("weighted_median_cents"))
        .select(col("n").as("n_users"), col("tw").as("total_weight"),
          col("weighted_median_cents"))
    },

    // ---- U37: leave-one-out target encoding --------------------------------
    // The feature-store staple: encode each order's nation as the mean
    // order value of the SAME nation excluding the row itself —
    // (S_c − x)/(n_c − 1) — which kills the self-leakage naive target
    // encoding has. Group moments are exact DECIMAL-cent sums
    // broadcast back onto the scan; the per-row encode is one double
    // division of exact integers. Zero extra shuffles beyond the
    // group aggregate.
    QueryDef.sql(
      "u37_target_encoding",
      """WITH o AS (
        |  SELECT o_orderkey, c_nationkey AS nation,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |g AS (SELECT nation, CAST(sum(cents) AS BIGINT) AS s,
        |  CAST(count(*) AS BIGINT) AS n FROM o GROUP BY 1)
        |SELECT o.o_orderkey, o.nation,
        |  CASE WHEN g.n > 1 THEN
        |    CAST((g.s - o.cents) * 1000000 // (g.n - 1) AS BIGINT)
        |  ELSE NULL END AS loo_mean_microcents
        |FROM o JOIN g ON o.nation = g.nation""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey").as("nation"),
          (col("o_totalprice").cast(DecimalType(18, 4)) * 100).cast("long").as("cents"))
      val g = o.groupBy(col("nation"))
        .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
      // truncated exact micro-cents: a rounded double mean hits
      // .xxxxxx5 half-boundaries at this row count (the ev58 gotcha)
      o.join(broadcast(g), "nation")
        .select(col("o_orderkey"), col("nation"),
          when(col("n") > 1,
            expr("(s - cents) * 1000000 div (n - 1)").cast("long"))
            .otherwise(lit(null)).as("loo_mean_microcents"))
    }
  )
}
