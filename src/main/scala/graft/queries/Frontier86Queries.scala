package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Eighty-sixth frontier batch: blocking-scheme evaluation, Little's law
  * conservation audit, kernel two-sample MMD.
  */
object Frontier86Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- J17: blocking-scheme quality (reduction ratio / completeness) --------
    // Entity-resolution blocking is evaluated by two numbers: how much
    // of the all-pairs space the blocks discard (reduction ratio) and
    // how many TRUE duplicate pairs survive blocking (pairs
    // completeness vs the planted 48-char-prefix families). Every
    // count is group-size arithmetic — Σ C(size,2) over blocks,
    // families, and their intersections — so the evaluation NEVER
    // enumerates a candidate pair: the formulation that still runs
    // when all-pairs is 10¹⁸.
    QueryDef.sql(
      "j17_blocking_quality",
      """WITH d AS (
        |  SELECT doc_id, lang, n_chars // 100 AS lenb,
        |    md5(substring(text, 1, 48)) AS fam
        |  FROM documents),
        |blocks AS (
        |  SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n_cand FROM
        |    (SELECT CAST(count(*) AS BIGINT) AS c FROM d GROUP BY lang, lenb)),
        |fams AS (
        |  SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n_truth FROM
        |    (SELECT CAST(count(*) AS BIGINT) AS c FROM d GROUP BY fam)),
        |bt AS (
        |  SELECT CAST(sum(c * (c - 1) // 2) AS BIGINT) AS n_found FROM
        |    (SELECT CAST(count(*) AS BIGINT) AS c FROM d
        |     GROUP BY fam, lang, lenb)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM d)
        |SELECT nn.n_docs, blocks.n_cand, fams.n_truth, bt.n_found,
        |  CAST(1000 - blocks.n_cand * 1000 // (nn.n_docs * (nn.n_docs - 1) // 2)
        |    AS BIGINT) AS reduction_permille,
        |  CAST(CASE WHEN fams.n_truth > 0
        |    THEN bt.n_found * 1000 // fams.n_truth ELSE 1000 END AS BIGINT)
        |    AS completeness_permille
        |FROM nn CROSS JOIN blocks CROSS JOIN fams CROSS JOIN bt""".stripMargin) { (s, d) =>
      val dd = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), expr("n_chars div 100").as("lenb"),
          md5(substring(col("text"), 1, 48)).as("fam"))
        .localCheckpoint(true) // four group-size passes read one keying pass
      def pairSum(df: DataFrame, keys: Seq[String], out: String): DataFrame =
        df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
          .agg(sum(expr("c * (c - 1) div 2")).cast("long").as(out))
      val blocks = pairSum(dd, Seq("lang", "lenb"), "n_cand")
      val fams = pairSum(dd, Seq("fam"), "n_truth")
      val both = pairSum(dd, Seq("fam", "lang", "lenb"), "n_found")
      val nn = dd.agg(count(lit(1)).as("n_docs"))
      nn.crossJoin(broadcast(blocks)).crossJoin(broadcast(fams))
        .crossJoin(broadcast(both))
        .select(col("n_docs"), col("n_cand"), col("n_truth"), col("n_found"),
          expr("cast(1000 - n_cand * 1000 div (n_docs * (n_docs - 1) div 2) as bigint)")
            .as("reduction_permille"),
          expr("cast(CASE WHEN n_truth > 0 THEN n_found * 1000 div n_truth ELSE 1000 END as bigint)")
            .as("completeness_permille"))
    },

    // ---- EV94: Little's law conservation audit --------------------------------
    // L = λW, certified on the actual trace: total session-time is
    // computed TWO independent ways — the direct Σ(end−start) over
    // sessions, and the time-integral of concurrency from a boundary
    // sweep (+1/−1 deltas, global prefix sum via the two-phase
    // shard-offset shape, integrated between consecutive boundaries).
    // The two integer-µs totals land in the same row; the hash gate
    // certifies the conservation identity, and L, λ, W come from one
    // exact division each.
    QueryDef.sql(
      "ev94_littles_law",
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS t,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
        |      OR lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |      THEN 1 ELSE 0 END AS new_s
        |  FROM events),
        |sess AS (
        |  SELECT user_id, CAST(min(t) AS BIGINT) AS st, CAST(max(t) AS BIGINT) AS en
        |  FROM (SELECT user_id, t,
        |          sum(new_s) OVER (PARTITION BY user_id ORDER BY t, event_id
        |            ROWS UNBOUNDED PRECEDING) AS sid
        |        FROM e)
        |  GROUP BY user_id, sid),
        |direct AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_sessions,
        |    CAST(sum(en - st) AS BIGINT) AS busy_direct
        |  FROM sess),
        |bounds AS (
        |  SELECT st AS t, CAST(1 AS BIGINT) AS delta FROM sess
        |  UNION ALL SELECT en, -1 FROM sess),
        |sweep AS (
        |  SELECT t, CAST(sum(delta) AS BIGINT) AS d
        |  FROM bounds GROUP BY t),
        |integ AS (
        |  SELECT CAST(sum(run * (nxt - t)) AS BIGINT) AS busy_swept FROM (
        |    SELECT t,
        |      sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS run,
        |      lead(t) OVER (ORDER BY t) AS nxt
        |    FROM sweep)
        |  WHERE nxt IS NOT NULL),
        |span AS (
        |  SELECT CAST(max(en) - min(st) AS BIGINT) AS makespan FROM sess)
        |SELECT d.n_sessions, d.busy_direct, i.busy_swept, s.makespan,
        |  CAST(CAST(d.busy_direct AS HUGEINT) * 1000000 // s.makespan AS BIGINT) AS l_micro,
        |  CAST(d.busy_direct // d.n_sessions AS BIGINT) AS w_mean_us
        |FROM direct d CROSS JOIN integ i CROSS JOIN span s""".stripMargin) { (s, d) =>
      val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val e = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts)").as("t"), col("ts"), col("event_id"))
        .withColumn("new_s",
          when(col("t") - lag(col("t"), 1).over(wUser) > 1800000000L, 1)
            .when(lag(col("t"), 1).over(wUser).isNull, 1).otherwise(0))
      val sess = e
        .withColumn("sid", sum(col("new_s")).over(Window.partitionBy(col("user_id"))
          .orderBy(col("t"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("t")).as("st"), max(col("t")).as("en"))
        .localCheckpoint(true) // direct sum, sweep, and span read the sessions
      val direct = sess.agg(count(lit(1)).as("n_sessions"),
        sum(col("en") - col("st")).cast("long").as("busy_direct"))
      val bounds = sess.select(col("st").as("t"), lit(1L).as("delta"))
        .unionByName(sess.select(col("en").as("t"), lit(-1L).as("delta")))
      val sweep = bounds.groupBy(col("t")).agg(sum(col("delta")).cast("long").as("d"))
      // two-phase global prefix sum over boundary times (no global window)
      val shards = s.conf.get("spark.sql.shuffle.partitions", "32").toInt
      val ranged = sweep.repartitionByRange(shards, col("t"))
        .withColumn("__shard", spark_partition_id())
        .localCheckpoint(true) // pins sampled range boundaries
      val local = ranged.withColumn("__lrun",
        sum(col("d")).over(Window.partitionBy(col("__shard")).orderBy(col("t"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__lnxt", lead(col("t"), 1).over(Window.partitionBy(col("__shard"))
          .orderBy(col("t"))))
      val offsets = ranged.groupBy(col("__shard"))
        .agg(sum(col("d")).as("__scnt"), min(col("t")).as("__smin"))
        .withColumn("__off", coalesce(sum(col("__scnt")).over(Window
          .orderBy(col("__shard")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("__nextmin", lead(col("__smin"), 1).over(Window.orderBy(col("__shard"))))
        .select(col("__shard"), col("__off"), col("__nextmin"))
      val integ = local.join(broadcast(offsets), "__shard")
        .select((col("__off") + col("__lrun")).as("run"),
          coalesce(col("__lnxt"), col("__nextmin")).as("nxt"), col("t"))
        .filter(col("nxt").isNotNull)
        .agg(sum(col("run") * (col("nxt") - col("t"))).cast("long").as("busy_swept"))
      val span = sess.agg((max(col("en")) - min(col("st"))).cast("long").as("makespan"))
      direct.crossJoin(broadcast(integ)).crossJoin(broadcast(span))
        .select(col("n_sessions"), col("busy_direct"), col("busy_swept"),
          col("makespan"),
          expr("cast(cast(busy_direct as decimal(38,0)) * 1000000 div makespan as bigint)").as("l_micro"),
          expr("cast(busy_direct div n_sessions as bigint)").as("w_mean_us"))
    },

    // ---- V53: kernel two-sample test (MMD, polynomial kernel) -----------------
    // Distribution-shift detection in embedding space WITHOUT pair
    // enumeration: with kernel k(x,y) = (x·y)², every pair-sum
    // Σᵢⱼ k(xᵢ,yⱼ) collapses to ⟨G_X, G_Y⟩ where G is the group's
    // 64×64 second-moment matrix — one O(n·d²) pass, then a 4096-cell
    // inner product per label pair. Coordinates quantize to integer
    // milli-units, so the per-pair mean kernel values and the biased
    // MMD² estimate are exact integer arithmetic. Reference group =
    // label 0; one row per other label.
    QueryDef.sql(
      "v53_mmd_shift",
      """WITH e AS (
        |  SELECT vec_id, label, list_transform(range(1, 65),
        |    i -> CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT)) AS q
        |  FROM embeddings),
        |g AS (
        |  SELECT label, i.i,
        |    CAST(sum(q[(i.i - 1) // 64 + 1] * q[(i.i - 1) % 64 + 1]) AS BIGINT)
        |      AS gv
        |  FROM e, (SELECT unnest(generate_series(1, 4096)) AS i) i
        |  GROUP BY 1, 2),
        |cnt AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM e GROUP BY 1),
        |s AS (
        |  SELECT ga.label AS la, gb.label AS lb,
        |    sum(CAST(ga.gv AS HUGEINT) * gb.gv) AS sv
        |  FROM g ga JOIN g gb ON ga.i = gb.i
        |  GROUP BY 1, 2)
        |SELECT CAST(sy.lb AS INT) AS label,
        |  CAST(sxx.sv // (cx.n * cx.n) AS BIGINT) AS kxx_mean,
        |  CAST(sy.sv // (cy.n * cy.n) AS BIGINT) AS kyy_mean,
        |  CAST(sxy.sv // (cx.n * cy.n) AS BIGINT) AS kxy_mean,
        |  CAST(sxx.sv // (cx.n * cx.n) + sy.sv // (cy.n * cy.n)
        |    - 2 * (sxy.sv // (cx.n * cy.n)) AS BIGINT) AS mmd2_units
        |FROM (SELECT * FROM s WHERE la = lb AND la <> 0) sy
        |JOIN (SELECT * FROM s WHERE la = 0 AND lb = 0) sxx ON true
        |JOIN s sxy ON sxy.la = 0 AND sxy.lb = sy.lb
        |JOIN cnt cx ON cx.label = 0
        |JOIN cnt cy ON cy.label = sy.lb
        |ORDER BY 1""".stripMargin) { (s, d) =>
      // r5 opt: the Gram pass below posexplodes dim² elements per row —
      // running that inside the single-row-group scan task serializes
      // the whole query on one core. Spread the scan by vec_id first
      // (integer sums are partition-invariant, so results are
      // unchanged); the groupBy's exchange then receives map-side
      // partials from every core.
      val e = graft.operators.Spread.by(Tables.embeddings(s, d), col("vec_id"))
        .select(col("vec_id"), col("label"),
          transform(col("embedding"),
            x => floor(x.cast("double") * lit(1000)).cast("long")).as("q"))
      val g = e
        .select(col("label"),
          posexplode(expr("flatten(transform(q, x -> transform(q, y -> x * y)))"))
            .as(Seq("p", "v")))
        .groupBy(col("label"), (col("p") + 1).as("i"))
        .agg(sum(col("v")).cast("long").as("gv"))
        .localCheckpoint(true) // all three pair-sums read one moment pass
      val cnt = e.groupBy(col("label")).agg(count(lit(1)).as("n"))
      val sTab = g.alias("ga")
        .join(g.select(col("label").as("lb"), col("i"), col("gv").as("gvb")), "i")
        .groupBy(col("label").as("la"), col("lb"))
        .agg(sum(expr("cast(gv as decimal(38,0)) * gvb")).as("sv"))
        .localCheckpoint(true) // sxx / syy / sxy slices read it
      val sxx = sTab.filter(col("la") === 0 && col("lb") === 0)
        .select(col("sv").as("svxx"))
      val syy = sTab.filter(col("la") === col("lb") && col("la") =!= 0)
        .select(col("lb"), col("sv").as("svyy"))
      val sxy = sTab.filter(col("la") === 0 && col("lb") =!= 0)
        .select(col("lb"), col("sv").as("svxy"))
      val cx = cnt.filter(col("label") === 0).select(col("n").as("nx"))
      syy.join(sxy, "lb")
        .crossJoin(broadcast(sxx)).crossJoin(broadcast(cx))
        .join(broadcast(cnt.select(col("label").as("lb"), col("n").as("ny"))), "lb")
        .select(col("lb").cast("int").as("label"),
          expr("cast(svxx div (nx * nx) as bigint)").as("kxx_mean"),
          expr("cast(svyy div (ny * ny) as bigint)").as("kyy_mean"),
          expr("cast(svxy div (nx * ny) as bigint)").as("kxy_mean"),
          expr("""cast(svxx div (nx * nx) + svyy div (ny * ny)
            - 2 * (svxy div (nx * ny)) as bigint)""").as("mmd2_units"))
        .orderBy(col("label"))
    }
  )
}
