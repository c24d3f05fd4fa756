package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Twenty-ninth frontier batch: Wald–Wolfowitz runs test, shard-balance
  * audit, and exact embedding outlier detection.
  */
object Frontier29Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A78: Wald–Wolfowitz runs test ---------------------------------------
    // Is the daily revenue series random around its median, or does it
    // trend/cycle? Sign = above/below the MEDIAN-BY-MIDDLE-RANK (a21's
    // exact rule — ties at the median drop), runs count via one lag
    // over the calendar-bounded day axis, and the z statistic's
    // closed form runs on exact integer (n₊, n₋, R) with fixed float
    // op order, round 6.
    QueryDef.sql(
      "a78_runs_test",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |rk AS (
        |  SELECT day, x,
        |    row_number() OVER (ORDER BY x, day) AS r,
        |    count(*) OVER () AS n
        |  FROM daily),
        |med AS (
        |  SELECT CAST(avg(CAST(x AS DOUBLE)) AS DOUBLE) AS m
        |  FROM rk WHERE r IN ((n + 1) // 2, (n + 2) // 2)),
        |signs AS (
        |  SELECT day, CASE WHEN CAST(x AS DOUBLE) > m THEN 1 ELSE -1 END AS s
        |  FROM daily CROSS JOIN med WHERE CAST(x AS DOUBLE) <> m),
        |runs AS (
        |  SELECT s, CASE WHEN lag(s) OVER (ORDER BY day) IS NULL
        |                  OR lag(s) OVER (ORDER BY day) <> s THEN 1 ELSE 0 END AS brk
        |  FROM signs),
        |stat AS (
        |  SELECT CAST(sum(brk) AS BIGINT) AS r_runs,
        |    CAST(count(*) FILTER (WHERE s = 1) AS BIGINT) AS np,
        |    CAST(count(*) FILTER (WHERE s = -1) AS BIGINT) AS nm
        |  FROM runs)
        |SELECT r_runs, np, nm,
        |  round(1.0 + 2.0 * CAST(np * nm AS DOUBLE) / CAST(np + nm AS DOUBLE), 6)
        |    AS expected_runs,
        |  CASE WHEN np > 0 AND nm > 0 AND np + nm > 1 THEN
        |    round((CAST(r_runs AS DOUBLE)
        |        - (1.0 + 2.0 * CAST(np * nm AS DOUBLE) / CAST(np + nm AS DOUBLE)))
        |      / sqrt(CAST(2 * np * nm * (2 * np * nm - np - nm) AS DOUBLE)
        |        / (CAST((np + nm) * (np + nm) AS DOUBLE) * CAST(np + nm - 1 AS DOUBLE))), 6)
        |  ELSE NULL END AS z
        |FROM stat""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"))
      val rk = daily
        .withColumn("r", row_number().over(Window.orderBy(col("x"), col("day"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      val med = rk.filter(col("r") === expr("(n + 1) div 2") ||
          col("r") === expr("(n + 2) div 2"))
        .agg(avg(col("x").cast("double")).as("m"))
      val signs = daily.crossJoin(broadcast(med))
        .filter(col("x").cast("double") =!= col("m"))
        .select(col("day"),
          when(col("x").cast("double") > col("m"), 1).otherwise(-1).as("s"))
      val wD = Window.orderBy(col("day"))
      val runs = signs.withColumn("brk",
        when(lag(col("s"), 1).over(wD).isNull ||
          lag(col("s"), 1).over(wD) =!= col("s"), 1).otherwise(0))
      val stat = runs.agg(sum(col("brk")).as("r_runs"),
        count(when(col("s") === 1, 1)).as("np"),
        count(when(col("s") === -1, 1)).as("nm"))
      val np = col("np"); val nm = col("nm")
      val expRuns = lit(1.0) + lit(2.0) * (np * nm).cast("double") / (np + nm).cast("double")
      val varNum = (lit(2) * np * nm * (lit(2) * np * nm - np - nm)).cast("double")
      val varDen = ((np + nm) * (np + nm)).cast("double") * (np + nm - 1).cast("double")
      stat.select(col("r_runs"), np, nm,
        round(expRuns, 6).as("expected_runs"),
        when(np > 0 && nm > 0 && np + nm > 1,
          round((col("r_runs").cast("double") - expRuns) / sqrt(varNum / varDen), 6))
          .otherwise(lit(null)).as("z"))
    },

    // ---- C30: shard-balance audit --------------------------------------------
    // Is md5 a fair sharding function for this key population? Docs
    // map to 64 virtual shards by hash; the audit reports the size
    // spread and the imbalance factor max/mean (the number a shuffle
    // planner actually cares about — one hot shard = one straggler
    // task). Exact integer sizes; two divisions, round 6.
    QueryDef.sql(
      "c30_shard_balance",
      """WITH sh AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INTEGER) % 64
        |    AS shard
        |  FROM documents),
        |sizes AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_shards,
        |  CAST(min(n) AS BIGINT) AS min_size,
        |  CAST(max(n) AS BIGINT) AS max_size,
        |  round(CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_size,
        |  round(CAST(max(n) AS DOUBLE)
        |    / (CAST(sum(n) AS DOUBLE) / CAST(count(*) AS DOUBLE)), 6) AS imbalance
        |FROM sizes""".stripMargin) { (s, d) =>
      val sh = Tables.documents(s, d)
        .select((conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 64).as("shard"))
      val sizes = sh.groupBy(col("shard")).agg(count(lit(1)).as("n"))
      sizes.agg(count(lit(1)).as("n_shards"),
        min(col("n")).as("min_size"), max(col("n")).as("max_size"),
        round(sum(col("n")).cast("double") / count(lit(1)).cast("double"), 6)
          .as("mean_size"),
        round(max(col("n")).cast("double")
          / (sum(col("n")).cast("double") / count(lit(1)).cast("double")), 6)
          .as("imbalance"))
    },

    // ---- V22: embedding outlier detection (exact) ----------------------------
    // Which vectors sit suspiciously far from their label's centroid?
    // v20's rational-distance trick plus an integer two-sigma rule:
    // with 1e4-quantized vectors, D_i = ||n·q_i − s||² is an exact
    // integer (n²·squared-distance), and the flag
    //   n·D_i − S1 > 0  AND  (n·D_i − S1)² > 4·(n·S2 − S1²)
    // is the μ+2σ test with EVERY comparison cross-multiplied into
    // exact integers — no division, no sqrt, no float anywhere in the
    // verdict. The 1e4 scale keeps S2 = ΣD² inside 38 digits. Output:
    // per-label counts + flagged share.
    QueryDef.sql(
      "v22_embedding_outliers",
      """WITH q AS (
        |  SELECT vec_id, label, dim,
        |    CAST(floor(CAST(embedding[dim] AS DOUBLE) * 10000.0) AS BIGINT) AS qd
        |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS dim)),
        |cent AS (
        |  SELECT label, dim, CAST(sum(qd) AS HUGEINT) AS sd,
        |    CAST(count(*) AS HUGEINT) AS n
        |  FROM q GROUP BY 1, 2),
        |dist AS (
        |  SELECT q.vec_id, q.label,
        |    CAST(sum((c.n * q.qd - c.sd) * (c.n * q.qd - c.sd)) AS HUGEINT) AS di
        |  FROM q JOIN cent c ON c.label = q.label AND c.dim = q.dim
        |  GROUP BY 1, 2),
        |mom AS (
        |  SELECT label, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(di) AS HUGEINT) AS s1, CAST(sum(di * di) AS HUGEINT) AS s2
        |  FROM dist GROUP BY 1),
        |flags AS (
        |  SELECT d.label,
        |    CASE WHEN m.n * d.di - m.s1 > 0
        |          AND (m.n * d.di - m.s1) * (m.n * d.di - m.s1)
        |            > 4 * (m.n * m.s2 - m.s1 * m.s1)
        |      THEN 1 ELSE 0 END AS flagged
        |  FROM dist d JOIN mom m USING (label))
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(flagged) AS BIGINT) AS n_outliers,
        |  round(CAST(sum(flagged) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
        |    AS outlier_frac
        |FROM flags GROUP BY label""".stripMargin) { (s, d) =>
      val dec = DecimalType(38, 0)
      val q = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000.0d) as bigint))")
            .as("qv"))
      val cent = q
        .select(col("label"), posexplode(col("qv")).as(Seq("pos", "qd")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("qd").cast(dec)).as("sd"), count(lit(1)).cast(dec).as("cn"))
        .groupBy(col("label"))
        .agg(transform(sort_array(collect_list(struct(col("pos"), col("sd")))),
          e => e.getField("sd")).as("sv"),
          max(col("cn")).as("cn"))
      val dist = q.join(broadcast(cent), Seq("label"))
        .withColumn("di",
          aggregate(zip_with(col("qv"), col("sv"),
            (a, b) => (col("cn") * a.cast(dec) - b) * (col("cn") * a.cast(dec) - b)),
            lit(BigDecimal(0)).cast(dec), (acc, x) => acc + x))
        .select(col("vec_id"), col("label"), col("di"))
      val mom = dist.groupBy(col("label"))
        .agg(count(lit(1)).cast(dec).as("n"),
          sum(col("di")).as("s1"), sum(col("di") * col("di")).as("s2"))
      val flags = dist.join(broadcast(mom), Seq("label"))
        .select(col("label"),
          when(col("n") * col("di") - col("s1") > 0 &&
            (col("n") * col("di") - col("s1")) * (col("n") * col("di") - col("s1"))
              > lit(4) * (col("n") * col("s2") - col("s1") * col("s1")),
            1).otherwise(0).as("flagged"))
      flags.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"), sum(col("flagged")).as("n_outliers"),
          round(sum(col("flagged")).cast("double") / count(lit(1)).cast("double"), 6)
            .as("outlier_frac"))
    }
  )
}
