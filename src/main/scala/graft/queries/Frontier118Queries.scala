package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.ShardedRank
import graft.streaming.StreamStage

/** Hundred-eighteenth frontier batch: complete-output-mode streaming
  * (the one output mode not yet under the gate — global sort + limit is
  * ONLY legal there), a recommendation-diversity audit over co-purchase
  * top-5 lists, and Fagin's threshold-algorithm stopping depth for a
  * two-list rank join.
  */
object Frontier118Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- EV102S: complete-mode streaming leaderboard ----------------------------
    // Structured Streaming allows orderBy + limit ONLY after an
    // aggregation in complete output mode — the live-leaderboard shape.
    // The staged source splits the real events into two micro-batches
    // (no flush rows: complete mode has no watermark; the memory sink
    // REPLACES the table each trigger), so the final snapshot must
    // equal the batch top-10 — which is the oracle. State holds one row
    // per user: bounded keys are the documented precondition of
    // complete mode at scale.
    QueryDef.sql(
      "ev102s_stream_leaderboard",
      """SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS spend_cents
        |FROM events GROUP BY 1
        |ORDER BY n_events DESC, user_id ASC LIMIT 10""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      val bulk = ev.filter(pmod(col("event_id"), lit(2)) === 0)
      val rest = ev.filter(pmod(col("event_id"), lit(2)) === 1)
      val src = new java.io.File(d, "events.parquet")
      val key = s"lb:$d:${src.lastModified}:${src.length}"
      StreamStage.run(s, "ev102s_out",
        s"${graft.streaming.StreamStage.stageRoot}/lb_${new java.io.File(d).getName}",
        bulk, Seq(rest), shufflePartitions = Some(graft.streaming.StreamStage.benchParts), reuseKey = Some(key),
        outputMode = "complete") { stream =>
        stream.groupBy(col("user_id"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            sum(floor(col("value") * 100).cast("long")).cast("long")
              .as("spend_cents"))
          .orderBy(col("n_events").desc, col("user_id").asc)
          .limit(10)
      }
    },

    // ---- V57: recommendation-diversity audit ------------------------------------
    // Item-item top-5 co-purchase recommendations, audited per source
    // brand for the two failure modes rec systems monitor: catalog
    // coverage (what share of the catalog is EVER recommended) and
    // intra-list brand diversity (how many distinct brands an average
    // list shows). One self-join on the order key builds the
    // co-purchase graph; the top-5 cut is a per-item window; both
    // audit aggregates are grouped, never global.
    QueryDef.sql(
      "v57_rec_diversity",
      """WITH pairs AS (
        |  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM lineitem a JOIN lineitem b ON b.l_orderkey = a.l_orderkey
        |  WHERE a.l_partkey <> b.l_partkey
        |  GROUP BY 1, 2),
        |recs AS (
        |  SELECT pa, pb FROM (
        |    SELECT pa, pb,
        |      row_number() OVER (PARTITION BY pa ORDER BY cnt DESC, pb ASC)
        |        AS rn
        |    FROM pairs) WHERE rn <= 5),
        |catalog AS (SELECT CAST(count(*) AS BIGINT) AS n_parts FROM part),
        |lists AS (
        |  SELECT r.pa, sa.p_brand AS brand_a,
        |    CAST(count(DISTINCT sb.p_brand) AS BIGINT) AS n_brands,
        |    CAST(count(*) AS BIGINT) AS list_len
        |  FROM recs r
        |  JOIN part sa ON sa.p_partkey = r.pa
        |  JOIN part sb ON sb.p_partkey = r.pb
        |  GROUP BY 1, 2),
        |cov AS (
        |  SELECT sa.p_brand AS brand_a,
        |    CAST(count(DISTINCT r.pb) AS BIGINT) AS n_recommended
        |  FROM recs r JOIN part sa ON sa.p_partkey = r.pa
        |  GROUP BY 1)
        |SELECT l.brand_a AS brand,
        |  CAST(count(*) AS BIGINT) AS n_lists,
        |  CAST(sum(l.list_len) AS BIGINT) AS n_recs,
        |  c.n_recommended,
        |  CAST(c.n_recommended * 1000 // g.n_parts AS BIGINT)
        |    AS coverage_permille,
        |  CAST(sum(l.n_brands) * 1000 // count(*) AS BIGINT)
        |    AS brand_diversity_milli
        |FROM lists l
        |JOIN cov c ON c.brand_a = l.brand_a
        |CROSS JOIN catalog g
        |GROUP BY 1, 4, 5 ORDER BY 1""".stripMargin) { (s, d) =>
      // r6 opt: aggregate-before-join (PairGraph's discipline, weighted
      // variant): the line-level self-join on l_orderkey emitted one
      // row per (order, lineitem_a, lineitem_b) — n² rows per order
      // through an SMJ. The count it feeds is Σ_orders c_a(o)·c_b(o)
      // with c the per-order part multiplicity, so aggregate to
      // (order, part, c) first and explode the m² weighted DIRECTED
      // pairs (m = distinct parts per order, m ≤ n) — no join, and the
      // pair stream shrinks by the multiplicity factor. Exact integers.
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      val pairs = li
        .groupBy(col("l_orderkey"), col("l_partkey")).agg(count(lit(1)).as("c"))
        .groupBy(col("l_orderkey"))
        .agg(collect_list(struct(col("l_partkey").as("p"), col("c"))).as("items"))
        .select(explode(expr(
          "flatten(transform(items, a -> transform(" +
            "filter(items, b -> b.p != a.p), " +
            "b -> named_struct('pa', a.p, 'pb', b.p, 'w', a.c * b.c))))"))
          .as("pr"))
        .groupBy(col("pr.pa").as("pa"), col("pr.pb").as("pb"))
        .agg(sum(col("pr.w")).cast("long").as("cnt"))
      val recs = pairs.withColumn("rn", row_number().over(
          Window.partitionBy(col("pa")).orderBy(col("cnt").desc, col("pb").asc)))
        .filter(col("rn") <= 5).select(col("pa"), col("pb"))
        .localCheckpoint(true) // read by both audit aggregates
      val partB = Tables.part(s, d)
        .select(col("p_partkey"), col("p_brand"))
      val joined = recs
        .join(partB.select(col("p_partkey").as("pa"),
          col("p_brand").as("brand_a")), Seq("pa"))
        .join(partB.select(col("p_partkey").as("pb"),
          col("p_brand").as("brand_b")), Seq("pb"))
      val lists = joined.groupBy(col("pa"), col("brand_a"))
        .agg(countDistinct(col("brand_b")).cast("long").as("n_brands"),
          count(lit(1)).cast("long").as("list_len"))
      val cov = joined.groupBy(col("brand_a"))
        .agg(countDistinct(col("pb")).cast("long").as("n_recommended"))
      val catalog = Tables.part(s, d)
        .agg(count(lit(1)).cast("long").as("n_parts"))
      lists.join(cov, Seq("brand_a")).crossJoin(broadcast(catalog))
        .groupBy(col("brand_a").as("brand"), col("n_recommended"),
          expr("n_recommended * 1000 div n_parts").cast("long")
            .as("coverage_permille"))
        .agg(count(lit(1)).cast("long").as("n_lists"),
          sum(col("list_len")).cast("long").as("n_recs"),
          expr("cast(sum(n_brands) * 1000 div count(*) as bigint)")
            .as("brand_diversity_milli"))
        .select(col("brand"), col("n_lists"), col("n_recs"),
          col("n_recommended"), col("coverage_permille"),
          col("brand_diversity_milli"))
        .orderBy(col("brand"))
    },

    // ---- J21: Fagin threshold-algorithm stopping depth --------------------------
    // The rank-join / top-k middleware question: combining two sorted
    // score lists (customer spend; order frequency), how deep must a
    // threshold-algorithm scan go before the global top-10 is provably
    // final? Answer: to max(first depth where s1[d]+s2[d] falls to the
    // 10th-best combined score, deepest first-appearance of a top-10
    // member). Both ranked lists come from ShardedRank (two-phase
    // sharded rank — no global window); the top-10 itself is a
    // TakeOrdered. The depth column is the instance-optimality bound —
    // on real data a few hundred rows instead of the full list.
    QueryDef.sql(
      "j21_rank_join_ta",
      """WITH stats AS (
        |  SELECT o_custkey AS ck,
        |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS s1,
        |    CAST(count(*) * 100000000 AS BIGINT) AS s2
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT ck, s1, s2, s1 + s2 AS score,
        |    row_number() OVER (ORDER BY s1 DESC, ck ASC) AS pos1,
        |    row_number() OVER (ORDER BY s2 DESC, ck ASC) AS pos2
        |  FROM stats),
        |top10 AS (
        |  SELECT * FROM (
        |    SELECT ck, s1, s2, score, pos1, pos2,
        |      row_number() OVER (ORDER BY score DESC, ck ASC) AS rank
        |    FROM ranked) WHERE rank <= 10),
        |k10 AS (
        |  SELECT min(score) AS score10,
        |    CAST(max(least(pos1, pos2)) AS BIGINT) AS seen_depth
        |  FROM top10),
        |th AS (
        |  SELECT a.pos1 AS dd, a.s1 AS s1v, b.s2 AS s2v
        |  FROM ranked a JOIN ranked b ON b.pos2 = a.pos1),
        |firstd AS (
        |  SELECT coalesce(min(t.dd), (SELECT count(*) FROM stats))
        |    AS th_depth
        |  FROM th t CROSS JOIN k10 k WHERE t.s1v + t.s2v <= k.score10),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM stats)
        |SELECT t.rank, t.ck, t.s1 AS spend_cents, t.s2 AS freq_score,
        |  t.score, CAST(t.pos1 AS BIGINT) AS pos1,
        |  CAST(t.pos2 AS BIGINT) AS pos2,
        |  CAST(greatest(f.th_depth, k.seen_depth) AS BIGINT) AS ta_depth,
        |  n.n_total
        |FROM top10 t CROSS JOIN firstd f CROSS JOIN k10 k CROSS JOIN n
        |ORDER BY t.rank""".stripMargin) { (s, d) =>
      val stats = Tables.orders(s, d).groupBy(col("o_custkey").as("ck"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).cast("long")
          .as("s1"),
          (count(lit(1)) * 100000000L).cast("long").as("s2"))
      val ranked = ShardedRank.withRanks(stats,
        "pos1" -> Seq(col("s1").desc, col("ck").asc),
        "pos2" -> Seq(col("s2").desc, col("ck").asc))
        .withColumn("score", col("s1") + col("s2"))
        .localCheckpoint(true) // feeds top-10, threshold list, and count
      val top10 = ranked.orderBy(col("score").desc, col("ck").asc).limit(10)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("score").desc, col("ck").asc))) // 10 rows
        .localCheckpoint(true)
      val k10 = top10.agg(min(col("score")).as("score10"),
        max(least(col("pos1"), col("pos2"))).cast("long").as("seen_depth"))
      val th = ranked.select(col("pos1").as("dd"), col("s1").as("s1v"))
        .join(ranked.select(col("pos2").as("dd"), col("s2").as("s2v")),
          Seq("dd"))
      val nTotal = ranked.agg(count(lit(1)).cast("long").as("n_total"))
      val firstd = th.crossJoin(broadcast(k10.select(col("score10"))))
        .filter(col("s1v") + col("s2v") <= col("score10"))
        .agg(min(col("dd")).as("mind"))
        .crossJoin(broadcast(nTotal))
        .select(coalesce(col("mind"), col("n_total")).as("th_depth"))
      top10.crossJoin(broadcast(firstd)).crossJoin(broadcast(k10))
        .crossJoin(broadcast(nTotal))
        .select(col("rank"), col("ck"), col("s1").as("spend_cents"),
          col("s2").as("freq_score"), col("score"),
          col("pos1").cast("long").as("pos1"),
          col("pos2").cast("long").as("pos2"),
          greatest(col("th_depth"), col("seen_depth")).cast("long")
            .as("ta_depth"),
          col("n_total"))
        .orderBy(col("rank"))
    }
  )
}
