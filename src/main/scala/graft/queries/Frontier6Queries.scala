package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Sixth frontier batch: metric-learning triplet mining, chi-square
  * independence with the float division deferred to per-cell terms,
  * and alert throttling — the ops between "model training data" and
  * "production monitoring" that a pipeline engine gets asked for next.
  */
object Frontier6Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- V17: hard triplet mining (anchor, hardest pos, hardest neg) ------
    // THE batch-mining op for contrastive/metric learning: per anchor,
    // the hardest positive is the SAME-label vector with MINIMUM
    // cosine, the hardest negative the different-label vector with
    // MAXIMUM cosine. One broadcast of the anchor set into the corpus
    // scan builds both pair streams off the same cosine column (v2's
    // strict-left-fold arithmetic — bit-reproducible, so rank ties are
    // impossible beyond the vec_id tie-break and the oracle mirrors
    // them exactly). Margin readout: neg_cos − pos_cos (violation > 0
    // means the triplet is "active" for the loss).
    QueryDef.sql(
      "v17_triplet_mining",
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS anchor_id, a.label AS anchor_label,
        |    b.vec_id AS cand_id, b.label AS cand_label,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(a.emb)+1), i -> a.emb[i]*b.emb[i])), (x,y) -> x+y)
        |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(a.emb)+1), i -> a.emb[i]*a.emb[i])), (x,y) -> x+y))
        |     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(b.emb)+1), i -> b.emb[i]*b.emb[i])), (x,y) -> x+y)))
        |      AS cosine
        |  FROM e a JOIN e b ON a.vec_id < 8 AND b.vec_id <> a.vec_id),
        |pos AS (
        |  SELECT anchor_id, cand_id AS pos_id, cosine AS pos_cos,
        |    row_number() OVER (PARTITION BY anchor_id ORDER BY cosine, cand_id) AS rk
        |  FROM pairs WHERE cand_label = anchor_label),
        |neg AS (
        |  SELECT anchor_id, cand_id AS neg_id, cosine AS neg_cos,
        |    row_number() OVER (PARTITION BY anchor_id ORDER BY cosine DESC, cand_id) AS rk
        |  FROM pairs WHERE cand_label <> anchor_label)
        |SELECT p.anchor_id, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos,
        |  n.neg_cos - p.pos_cos AS violation
        |FROM (SELECT * FROM pos WHERE rk = 1) p
        |JOIN (SELECT * FROM neg WHERE rk = 1) n ON p.anchor_id = n.anchor_id""".stripMargin) { (s, d) =>
      import graft.operators.VectorOps
      val emb = Tables.embeddings(s, d)
      val a = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("anchor_id"), col("label").as("anchor_label"),
          VectorOps.toDouble(col("embedding")).as("a_emb"))
        .withColumn("a_nrm", sqrt(VectorOps.dot(col("a_emb"), col("a_emb"))))
      val b = emb.select(col("vec_id").as("cand_id"), col("label").as("cand_label"),
          VectorOps.toDouble(col("embedding")).as("b_emb"))
        .withColumn("b_nrm", sqrt(VectorOps.dot(col("b_emb"), col("b_emb"))))
      val pairs = b.join(broadcast(a), col("cand_id") =!= col("anchor_id"))
        .select(col("anchor_id"), col("anchor_label"), col("cand_id"), col("cand_label"),
          VectorOps.cosinePre(col("a_emb"), col("b_emb"), col("a_nrm"), col("b_nrm"))
            .as("cosine"))
      val wPos = Window.partitionBy(col("anchor_id")).orderBy(col("cosine"), col("cand_id"))
      val wNeg = Window.partitionBy(col("anchor_id")).orderBy(col("cosine").desc, col("cand_id"))
      val pos = pairs.filter(col("cand_label") === col("anchor_label"))
        .withColumn("rk", row_number().over(wPos)).filter(col("rk") === 1)
        .select(col("anchor_id"), col("cand_id").as("pos_id"), col("cosine").as("pos_cos"))
      val neg = pairs.filter(col("cand_label") =!= col("anchor_label"))
        .withColumn("rk", row_number().over(wNeg)).filter(col("rk") === 1)
        .select(col("anchor_id"), col("cand_id").as("neg_id"), col("cosine").as("neg_cos"))
      pos.join(neg, "anchor_id")
        .select(col("anchor_id"), col("pos_id"), col("pos_cos"),
          col("neg_id"), col("neg_cos"), (col("neg_cos") - col("pos_cos")).as("violation"))
    },

    // ---- A39: chi-square test of independence ------------------------------
    // Is order priority independent of market segment? Per cell the
    // classic (O−E)²/E is re-expressed over exact integers: with row
    // sum r, column sum c, total N, the term equals
    // (O·N − r·c)² / (N·r·c) — numerator and denominator are exact
    // BIGINTs (cross-multiplied, no float E ever materializes), ONE
    // division per cell, then a cell-ordered fold and round-6. The
    // contingency table is one partial-agg shuffle; margins broadcast.
    QueryDef.sql(
      "a39_chi2_independence",
      """WITH ct AS (
        |  SELECT c_mktsegment AS seg, o_orderpriority AS pri,
        |    CAST(count(*) AS BIGINT) AS o
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rm AS (SELECT seg, CAST(sum(o) AS BIGINT) AS r FROM ct GROUP BY 1),
        |cm AS (SELECT pri, CAST(sum(o) AS BIGINT) AS c FROM ct GROUP BY 1),
        |nn AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM ct),
        |terms AS (
        |  SELECT ct.seg, ct.pri,
        |    CAST((ct.o * n - r * c) * (ct.o * n - r * c) AS DOUBLE)
        |      / CAST(n * r * c AS DOUBLE) AS term
        |  FROM ct JOIN rm ON ct.seg = rm.seg JOIN cm ON ct.pri = cm.pri CROSS JOIN nn)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list(term ORDER BY seg, pri)), (a, b) -> a + b), 6) AS chi2
        |FROM terms""".stripMargin) { (s, d) =>
      val ct = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"), col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).as("o"))
      val rm = ct.groupBy(col("seg")).agg(sum(col("o")).as("r"))
      val cm = ct.groupBy(col("pri")).agg(sum(col("o")).as("c"))
      val nn = ct.agg(sum(col("o")).as("n"))
      val dev = col("o") * col("n") - col("r") * col("c")
      val terms = ct.join(broadcast(rm), "seg").join(broadcast(cm), "pri")
        .crossJoin(broadcast(nn))
        .select(col("seg"), col("pri"),
          ((dev * dev).cast("double") / (col("n") * col("r") * col("c")).cast("double"))
            .as("term"))
      terms.agg(count(lit(1)).as("n_cells"),
        round(aggregate(
          transform(sort_array(collect_list(struct(col("seg"), col("pri"), col("term")))),
            x => x.getField("term")),
          lit(0.0), (acc, t) => acc + t), 6).as("chi2"))
    },

    // ---- EV36: alert throttling (first alert per user per 6 h) ------------
    // Pager discipline on top of w10's breakout stream: suppress all
    // but the FIRST alert in each (user, 6-hour bucket). The throttle
    // is a keyed min-aggregate on the bucket key (one shuffle on the
    // already-shrunk alert stream), with the alert identity pinned by
    // the (ts, event_id) total order — not a window over raw events.
    QueryDef.sql(
      "ev36_alert_throttle",
      """WITH v AS (
        |  SELECT user_id, ts, event_id,
        |    CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS x
        |  FROM events),
        |f AS (
        |  SELECT user_id, ts, event_id, x,
        |    CAST(sum(x) OVER w AS BIGINT) AS s,
        |    CAST(sum(x * x) OVER w AS BIGINT) AS q,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
        |  FROM v
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)),
        |alerts AS (
        |  SELECT user_id, ts, event_id, epoch_us(ts) // 21600000000 AS bucket
        |  FROM f WHERE rk >= 8
        |    AND 2 * (8 * x - s) * (8 * x - s) > 64 * q - 8 * s * s),
        |first AS (
        |  SELECT user_id, bucket, event_id,
        |    row_number() OVER (PARTITION BY user_id, bucket ORDER BY ts, event_id) AS arn,
        |    CAST(count(*) OVER (PARTITION BY user_id, bucket) AS BIGINT) AS suppressed
        |  FROM alerts)
        |SELECT user_id, make_timestamp(bucket * 21600000000) AS bucket_start,
        |  event_id AS first_alert_event, suppressed - 1 AS n_suppressed
        |FROM first WHERE arn = 1""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val frame = w.rowsBetween(-7, Window.currentRow)
      val x = (col("value").cast(DecimalType(18, 4)) * lit(10000)).cast("long")
      val f = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), x.as("x"))
        .withColumn("s", sum(col("x")).over(frame))
        .withColumn("q", sum(col("x") * col("x")).over(frame))
        .withColumn("rk", row_number().over(w))
      val dev = lit(8) * col("x") - col("s")
      val alerts = f.filter(col("rk") >= 8 &&
          lit(2) * dev * dev > lit(64) * col("q") - lit(8) * col("s") * col("s"))
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("unix_micros(ts) div 21600000000").as("bucket"))
      val wB = Window.partitionBy(col("user_id"), col("bucket"))
      val first = alerts
        .withColumn("arn", row_number().over(wB.orderBy(col("ts"), col("event_id"))))
        .withColumn("suppressed", count(lit(1)).over(wB))
      first.filter(col("arn") === 1)
        .select(col("user_id"),
          timestamp_micros(col("bucket") * lit(21600000000L)).as("bucket_start"),
          col("event_id").as("first_alert_event"),
          (col("suppressed") - 1).as("n_suppressed"))
    }
  )
}
