package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.operators.VectorOps

/** Sixty-sixth frontier batch: difference-in-differences estimator,
  * mutual-kNN pairing, incremental DISTINCT-view maintenance.
  */
object Frontier66Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A125: difference-in-differences estimator --------------------------
    // The workhorse causal design: treated users (odd ids — a
    // deterministic stand-in for a rollout cohort) vs control, before
    // vs after the day-15 "policy". DiD = (ȳ_T,post − ȳ_T,pre) −
    // (ȳ_C,post − ȳ_C,pre) over per-user-day purchase cents, kept
    // EXACT by placing all four means on the common denominator
    // Π n_cell (each term S·(Π div n) is integral). One user-day
    // aggregate → a 4-cell crumb → integer micro output.
    QueryDef.sql(
      "a125_diff_in_diff",
      """WITH ud AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(user_id % 2 AS INT) AS treated,
        |    CAST(CASE WHEN day(CAST(ts AS DATE)) > 15 THEN 1 ELSE 0 END AS INT)
        |      AS post,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
        |      AS cents
        |  FROM events GROUP BY 1, 2, 3, 4),
        |cells AS (
        |  SELECT treated, post, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS s
        |  FROM ud GROUP BY 1, 2),
        |w AS (
        |  SELECT
        |    max(CASE WHEN treated = 1 AND post = 1 THEN n END) AS n_tp,
        |    max(CASE WHEN treated = 1 AND post = 1 THEN s END) AS s_tp,
        |    max(CASE WHEN treated = 1 AND post = 0 THEN n END) AS n_t0,
        |    max(CASE WHEN treated = 1 AND post = 0 THEN s END) AS s_t0,
        |    max(CASE WHEN treated = 0 AND post = 1 THEN n END) AS n_cp,
        |    max(CASE WHEN treated = 0 AND post = 1 THEN s END) AS s_cp,
        |    max(CASE WHEN treated = 0 AND post = 0 THEN n END) AS n_c0,
        |    max(CASE WHEN treated = 0 AND post = 0 THEN s END) AS s_c0
        |  FROM cells),
        |p AS (
        |  SELECT *, CAST(n_tp AS HUGEINT) * n_t0 * n_cp * n_c0 AS prod FROM w)
        |SELECT n_tp, n_t0, n_cp, n_c0,
        |  CAST((s_tp * 1000000) // n_tp AS BIGINT) AS mean_tp_micro,
        |  CAST((s_t0 * 1000000) // n_t0 AS BIGINT) AS mean_t0_micro,
        |  CAST((s_cp * 1000000) // n_cp AS BIGINT) AS mean_cp_micro,
        |  CAST((s_c0 * 1000000) // n_c0 AS BIGINT) AS mean_c0_micro,
        |  CAST((CAST(s_tp AS HUGEINT) * (prod // n_tp)
        |      - CAST(s_t0 AS HUGEINT) * (prod // n_t0)
        |      - CAST(s_cp AS HUGEINT) * (prod // n_cp)
        |      + CAST(s_c0 AS HUGEINT) * (prod // n_c0)) * 1000000
        |    // prod AS BIGINT) AS did_cents_micro
        |FROM p""".stripMargin) { (s, d) =>
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val ud = Tables.events(s, d)
        .groupBy(col("user_id"), col("ts").cast("date").as("day"),
          (col("user_id") % 2).cast("int").as("treated"),
          when(dayofmonth(col("ts").cast("date")) > 15, 1).otherwise(0).as("post"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).cast("long")
          .as("cents"))
      val cells = ud.groupBy(col("treated"), col("post"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).cast("long").as("s"))
      def cell(t: Int, p: Int, c: String) =
        max(when(col("treated") === t && col("post") === p, col(c)))
      val w = cells.agg(
        cell(1, 1, "n").as("n_tp"), cell(1, 1, "s").as("s_tp"),
        cell(1, 0, "n").as("n_t0"), cell(1, 0, "s").as("s_t0"),
        cell(0, 1, "n").as("n_cp"), cell(0, 1, "s").as("s_cp"),
        cell(0, 0, "n").as("n_c0"), cell(0, 0, "s").as("s_c0"))
      val p = w.withColumn("prod",
        (col("n_tp").cast(dec) * col("n_t0") * col("n_cp") * col("n_c0")))
      p.select(col("n_tp"), col("n_t0"), col("n_cp"), col("n_c0"),
        expr("cast((s_tp * 1000000) div n_tp as bigint)").as("mean_tp_micro"),
        expr("cast((s_t0 * 1000000) div n_t0 as bigint)").as("mean_t0_micro"),
        expr("cast((s_cp * 1000000) div n_cp as bigint)").as("mean_cp_micro"),
        expr("cast((s_c0 * 1000000) div n_c0 as bigint)").as("mean_c0_micro"),
        expr("""cast((cast(s_tp as decimal(38,0)) * (prod div n_tp)
               - cast(s_t0 as decimal(38,0)) * (prod div n_t0)
               - cast(s_cp as decimal(38,0)) * (prod div n_cp)
               + cast(s_c0 as decimal(38,0)) * (prod div n_c0)) * 1000000
              div prod as bigint)""").as("did_cents_micro"))
    },

    // ---- V37: mutual k-nearest-neighbor pairing -----------------------------
    // The reciprocity filter clustering and matching pipelines apply on
    // top of raw kNN: keep (a, b) only when a ranks in b's top-5 AND b
    // ranks in a's top-5 — reciprocal pairs are far stronger duplicate/
    // match evidence than one-way neighbors. Both directions come from
    // ONE scored pair table (cosine is symmetric; the two rank windows
    // differ only in partition key), then a self-join on the reversed
    // key. Probe set bounded (200 vectors) as a registered demo; at
    // corpus scale the same shape runs per IVF cell.
    QueryDef.sql(
      "v37_mutual_knn",
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        |  WHERE vec_id < 200),
        |pairs AS (
        |  SELECT a.vec_id AS ia, b.vec_id AS ib,
        |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |        list_transform(range(1, len(a.emb)+1), i -> a.emb[i]*b.emb[i])), (x,y) -> x+y)
        |    / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(a.emb)+1), i -> a.emb[i]*a.emb[i])), (x,y) -> x+y))
        |     * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |          list_transform(range(1, len(b.emb)+1), i -> b.emb[i]*b.emb[i])), (x,y) -> x+y)))
        |      AS cosine
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |topk AS (
        |  SELECT ia, ib, cosine FROM (
        |    SELECT *, rank() OVER (PARTITION BY ia
        |      ORDER BY cosine DESC, ib) AS r FROM pairs) WHERE r <= 5)
        |SELECT t.ia AS id_a, t.ib AS id_b, round(t.cosine, 6) AS cosine
        |FROM topk t JOIN topk u ON t.ia = u.ib AND t.ib = u.ia
        |WHERE t.ia < t.ib
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val e = Tables.embeddings(s, d).filter(col("vec_id") < 200)
        .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("emb"))
        .withColumn("nrm", VectorOps.l2Norm(col("emb")))
      val a = e.select(col("vec_id").as("ia"), col("emb").as("ea"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("ib"), col("emb").as("eb"), col("nrm").as("nb"))
      val pairs = a.join(broadcast(b), col("ia") =!= col("ib"))
        .select(col("ia"), col("ib"),
          VectorOps.cosinePre(col("ea"), col("eb"), col("na"), col("nb")).as("cosine"))
      val topk = pairs.withColumn("r", rank().over(
          Window.partitionBy(col("ia")).orderBy(col("cosine").desc, col("ib"))))
        .filter(col("r") <= 5).select(col("ia"), col("ib"), col("cosine"))
        .localCheckpoint(true) // both sides of the reciprocity join
      val u = topk.select(col("ia").as("ua"), col("ib").as("ub"))
      topk.join(u, col("ia") === col("ub") && col("ib") === col("ua"))
        .filter(col("ia") < col("ib"))
        .select(col("ia").as("id_a"), col("ib").as("id_b"),
          round(col("cosine"), 6).as("cosine"))
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- U49: incremental DISTINCT-view maintenance -------------------------
    // The IVM case aggregates can't cover: DISTINCT needs per-key
    // multiplicity state (a deletion may or may not remove the key).
    // Maintain daily-distinct-users as stored (day, user) COUNTS from
    // the 90% base, apply the 10% delta by ⊕-ing counts, and emit the
    // maintained distinct-count — bit-equal to a full recompute (the
    // oracle) because counts are associative where presence flags are
    // not. Scale: the delta path touches only delta keys.
    QueryDef.sql(
      "u49_ivm_distinct",
      """SELECT CAST(ts AS DATE) AS day,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS distinct_users,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("ts").cast("date").as("day"), col("user_id"))
      def counts(df: DataFrame): DataFrame =
        df.groupBy(col("day"), col("user_id")).agg(count(lit(1)).as("m"))
      val stageDir = s"/tmp/graft_u49_ivm/${new java.io.File(d).getName}"
      Staging.stageOnce(stageDir, Staging.sourceKey(d, "events")) {
        counts(ev.filter(col("user_id") % 10 =!= 0))
          .write.mode("overwrite").parquet(s"$stageDir/stored")
      }
      val stored = s.read.parquet(s"$stageDir/stored")
      val delta = counts(ev.filter(col("user_id") % 10 === 0))
      stored.unionByName(delta)
        .groupBy(col("day"), col("user_id")).agg(sum(col("m")).as("m"))
        .filter(col("m") > 0)
        .groupBy(col("day"))
        .agg(count(lit(1)).as("distinct_users"),
          sum(col("m")).cast("long").as("n_events"))
        .orderBy(col("day"))
    }
  )
}
