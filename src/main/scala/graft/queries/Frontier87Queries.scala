package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Eighty-seventh frontier batch: direct rate standardization, load
  * duration curve, window-filter pushdown certification.
  */
object Frontier87Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A143: direct rate standardization ------------------------------------
    // The epidemiologist's fix for confounded comparisons (and the
    // constructive sequel to the Simpson detector): each nation's
    // order-completion rate is re-weighted to the GLOBAL order-priority
    // mix, so nations with different priority compositions become
    // comparable. Expected completions accumulate per stratum as
    // N_p·f_np·1000 div n_np (integer milli-events, truncation at the
    // stratum grain on both engines); crude and adjusted permille
    // rates land side by side.
    QueryDef.sql(
      "a143_standardized_rates",
      """WITH facts AS (
        |  SELECT c.c_nationkey AS nk, o.o_orderpriority AS p,
        |    CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END AS done
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |ref AS (SELECT p, CAST(count(*) AS BIGINT) AS np FROM facts GROUP BY 1),
        |refn AS (SELECT CAST(sum(np) AS BIGINT) AS nref FROM ref),
        |cell AS (
        |  SELECT nk, p, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(done) AS BIGINT) AS f
        |  FROM facts GROUP BY 1, 2),
        |adj AS (
        |  SELECT c.nk,
        |    CAST(sum(c.n) AS BIGINT) AS n_orders,
        |    CAST(sum(c.f) AS BIGINT) AS n_done,
        |    CAST(sum(r.np * c.f * 1000 // c.n) AS BIGINT) AS exp_milli
        |  FROM cell c JOIN ref r ON r.p = c.p
        |  GROUP BY 1)
        |SELECT CAST(a.nk AS INT) AS nation,
        |  a.n_orders, a.n_done,
        |  CAST(a.n_done * 1000 // a.n_orders AS BIGINT) AS crude_permille,
        |  CAST(a.exp_milli // rn.nref AS BIGINT) AS adjusted_permille
        |FROM adj a CROSS JOIN refn rn
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val facts = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"), col("o_orderpriority").as("p"),
          when(col("o_orderstatus") === "F", 1).otherwise(0).as("done"))
      val cell = facts.groupBy(col("nk"), col("p"))
        .agg(count(lit(1)).as("n"), sum(col("done")).cast("long").as("f"))
        .localCheckpoint(true) // reference mix and adjustments read it
      val ref = cell.groupBy(col("p")).agg(sum(col("n")).as("np"))
      val refn = ref.agg(sum(col("np")).cast("long").as("nref"))
      cell.join(broadcast(ref), "p")
        .groupBy(col("nk"))
        .agg(sum(col("n")).cast("long").as("n_orders"),
          sum(col("f")).cast("long").as("n_done"),
          sum(expr("np * f * 1000 div n")).cast("long").as("exp_milli"))
        .crossJoin(broadcast(refn))
        .select(col("nk").cast("int").as("nation"),
          col("n_orders"), col("n_done"),
          expr("cast(n_done * 1000 div n_orders as bigint)").as("crude_permille"),
          expr("cast(exp_milli div nref as bigint)").as("adjusted_permille"))
        .orderBy(col("nation"))
    },

    // ---- EV95: load duration curve --------------------------------------------
    // Capacity planning's favorite chart as a table: how many exact
    // microseconds does the system spend at EACH concurrency level
    // (concurrent 30-min sessions)? Boundary deltas sweep into a
    // running level via the two-phase shard-offset prefix sum (the
    // only unpartitioned window is over the 32-row shard table), each
    // inter-boundary gap is charged to its level, and the shares are
    // integer permille of the makespan.
    QueryDef.sql(
      "ev95_load_duration",
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
        |sweep AS (
        |  SELECT t, CAST(sum(delta) AS BIGINT) AS d FROM (
        |    SELECT st AS t, CAST(1 AS BIGINT) AS delta FROM sess
        |    UNION ALL SELECT en, -1 FROM sess)
        |  GROUP BY t),
        |lev AS (
        |  SELECT
        |    sum(d) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS level,
        |    lead(t) OVER (ORDER BY t) - t AS gap
        |  FROM sweep),
        |mk AS (SELECT CAST(max(en) - min(st) AS BIGINT) AS makespan FROM sess)
        |SELECT CAST(l.level AS BIGINT) AS level,
        |  CAST(sum(l.gap) AS BIGINT) AS total_us,
        |  CAST(sum(l.gap) * 1000 // mk.makespan AS BIGINT) AS share_permille
        |FROM lev l CROSS JOIN mk
        |WHERE l.gap IS NOT NULL AND l.gap > 0
        |GROUP BY 1, mk.makespan ORDER BY 1""".stripMargin) { (s, d) =>
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
        .localCheckpoint(true) // sweep and makespan read the sessions
      val sweep = sess.select(col("st").as("t"), lit(1L).as("delta"))
        .unionByName(sess.select(col("en").as("t"), lit(-1L).as("delta")))
        .groupBy(col("t")).agg(sum(col("delta")).cast("long").as("d"))
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
      val mk = sess.agg((max(col("en")) - min(col("st"))).cast("long").as("makespan"))
      local.join(broadcast(offsets), "__shard")
        .select((col("__off") + col("__lrun")).as("level"),
          (coalesce(col("__lnxt"), col("__nextmin")) - col("t")).as("gap"))
        .filter(col("gap").isNotNull && col("gap") > 0)
        .crossJoin(broadcast(mk))
        .groupBy(col("level").cast("long").as("level"), col("makespan"))
        .agg(sum(col("gap")).cast("long").as("total_us"))
        .select(col("level"), col("total_us"),
          expr("cast(total_us * 1000 div makespan as bigint)").as("share_permille"))
        .orderBy(col("level"))
    },

    // ---- Q35: window-filter pushdown certification ----------------------------
    // The query is AUTHORED with the selective user filter ABOVE the
    // rank window — the lazy way users write it — and Catalyst's
    // filter pushdown proves the predicate only references the
    // window's PARTITION key, slides it below the Window, and lands it
    // in the parquet scan (PushedFilters, pinned by PlanShapeSpec).
    // The oracle filters first, the way the optimizer executes it —
    // the hash gate certifies the transformation.
    QueryDef.sql(
      "q35_window_pushdown",
      """SELECT user_id, event_id,
        |  CAST(floor(value * 100) AS BIGINT) AS value_cents, rk
        |FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rk
        |  FROM events WHERE user_id < 500)
        |WHERE rk <= 2
        |ORDER BY user_id, rk""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("rk", row_number().over(Window.partitionBy(col("user_id"))
          .orderBy(col("value").desc, col("event_id"))))
        .filter(col("rk") <= 2 && col("user_id") < 500) // authored ABOVE the window
        .select(col("user_id"), col("event_id"),
          floor(col("value") * 100).cast("long").as("value_cents"), col("rk"))
        .orderBy(col("user_id"), col("rk"))
    }
  )
}
