package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Eighty-fourth frontier batch: process-conformance checking, IVM for
  * non-invertible MAX, Bloom filter false-positive calibration.
  */
object Frontier84Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- EV93: process-mining conformance check -------------------------------
    // Conformance checking against a declared process model: which
    // observed user-journey transitions are LEGAL under the allowed-
    // transition table, and where does real behavior leave the model?
    // Transitions come from one partitioned lag window per user
    // (ts + event_id total order); the model is a broadcast literal;
    // the report is the full transition matrix with legality flags and
    // permille shares — the process-mining readout, all integer-exact.
    QueryDef.sql(
      "ev93_conformance_check",
      """WITH model(f, t) AS (
        |  VALUES ('view','view'), ('view','click'), ('view','signup'),
        |    ('click','view'), ('click','click'), ('click','purchase'),
        |    ('signup','view'), ('purchase','view')),
        |tr AS (
        |  SELECT prev_type, event_type AS cur_type FROM (
        |    SELECT event_type,
        |      lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id) AS prev_type
        |    FROM events)
        |  WHERE prev_type IS NOT NULL),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM tr)
        |SELECT tr.prev_type, tr.cur_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CASE WHEN m.f IS NOT NULL THEN 1 ELSE 0 END AS legal,
        |  CAST(count(*) * 1000 // tot.n_all AS BIGINT) AS share_permille
        |FROM tr
        |LEFT JOIN model m ON m.f = tr.prev_type AND m.t = tr.cur_type
        |CROSS JOIN tot
        |GROUP BY 1, 2, 4, tot.n_all
        |ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val model = {
        import s.implicits._
        Seq(("view", "view"), ("view", "click"), ("view", "signup"),
          ("click", "view"), ("click", "click"), ("click", "purchase"),
          ("signup", "view"), ("purchase", "view")).toDF("f", "t")
      }
      val tr = Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1)
          .over(Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
        .filter(col("prev_type").isNotNull)
        .select(col("prev_type"), col("event_type").as("cur_type"))
      val tot = tr.agg(count(lit(1)).as("n_all"))
      tr.join(broadcast(model),
          col("f") === col("prev_type") && col("t") === col("cur_type"), "left")
        .crossJoin(broadcast(tot))
        .groupBy(col("prev_type"), col("cur_type"),
          when(col("f").isNotNull, 1).otherwise(0).as("legal"), col("n_all"))
        .agg(count(lit(1)).as("n"))
        .select(col("prev_type"), col("cur_type"), col("n"), col("legal"),
          expr("cast(n * 1000 div n_all as bigint)").as("share_permille"))
        .orderBy(col("prev_type"), col("cur_type"))
    },

    // ---- U65: IVM for MAX under deletions (top-2 state) -----------------------
    // MAX is the textbook NON-invertible aggregate: a delete can't be
    // subtracted back out. The maintained view stores the per-group
    // TOP-2, so a delete batch resolves each group locally — max
    // survives ('kept'), falls to the runner-up ('demoted'), or, only
    // when BOTH stored values die, falls back to a targeted
    // re-aggregation of that group alone ('recomputed'). The oracle
    // recomputes every group from scratch and replays the same path
    // classification — certifying the incremental result equals the
    // full recompute. Delete batch = orderkey % 97 = 0.
    QueryDef.sql(
      "u65_ivm_max",
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END AS del
        |  FROM orders),
        |top2 AS (
        |  SELECT o_custkey, cents, del, rn FROM (
        |    SELECT o_custkey, cents, del,
        |      row_number() OVER (PARTITION BY o_custkey
        |        ORDER BY cents DESC, o_orderkey) AS rn
        |    FROM o) WHERE rn <= 2),
        |state AS (
        |  SELECT o_custkey,
        |    max(CASE WHEN rn = 1 THEN cents END) AS max1,
        |    max(CASE WHEN rn = 1 THEN del END) AS del1,
        |    max(CASE WHEN rn = 2 THEN cents END) AS max2,
        |    max(CASE WHEN rn = 2 THEN del END) AS del2
        |  FROM top2 GROUP BY 1),
        |truth AS (
        |  SELECT o_custkey, CAST(max(cents) AS BIGINT) AS new_max
        |  FROM o WHERE del = 0 GROUP BY 1),
        |paths AS (
        |  SELECT s.o_custkey,
        |    CASE WHEN s.del1 = 0 THEN 'kept'
        |         WHEN s.del2 = 0 THEN 'demoted'
        |         ELSE 'recomputed' END AS path,
        |    t.new_max
        |  FROM state s JOIN truth t ON t.o_custkey = s.o_custkey)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(new_max) AS BIGINT) AS sum_max_cents
        |FROM paths GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"),
          when(col("o_orderkey") % 97 === 0, 1).otherwise(0).as("del"))
        .localCheckpoint(true) // state build + fallback rescans read it
      val top2 = o
        .withColumn("rn", row_number().over(Window.partitionBy(col("o_custkey"))
          .orderBy(col("cents").desc, col("o_orderkey"))))
        .filter(col("rn") <= 2)
      val state = top2.groupBy(col("o_custkey"))
        .agg(max(when(col("rn") === 1, col("cents"))).as("max1"),
          max(when(col("rn") === 1, col("del"))).as("del1"),
          max(when(col("rn") === 2, col("cents"))).as("max2"),
          max(when(col("rn") === 2, col("del"))).as("del2"))
        .localCheckpoint(true) // read by all three resolution paths
      // incremental resolution: kept / demoted groups close from state alone
      val local = state
        .filter(col("del1") === 0 || (col("del2").isNotNull && col("del2") === 0))
        .select(col("o_custkey"),
          when(col("del1") === 0, "kept").otherwise("demoted").as("path"),
          when(col("del1") === 0, col("max1")).otherwise(col("max2")).as("new_max"))
      // fallback: only the groups whose whole stored state died rescan
      val fbKeys = state
        .filter(col("del1") === 1 && (col("del2").isNull || col("del2") === 1))
        .select(col("o_custkey"))
      val fallback = o.filter(col("del") === 0)
        .join(broadcast(fbKeys), Seq("o_custkey"), "left_semi")
        .groupBy(col("o_custkey"))
        .agg(max(col("cents")).as("new_max"))
        .withColumn("path", lit("recomputed"))
        .select(col("o_custkey"), col("path"), col("new_max"))
      local.unionByName(fallback)
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_groups"),
          sum(col("new_max")).cast("long").as("sum_max_cents"))
        .orderBy(col("path"))
    },

    // ---- U66: Bloom filter false-positive calibration -------------------------
    // Measure a Bloom filter's REAL false-positive rate against the
    // textbook formula: members are the ordering customers, the filter
    // is m=131072 bits / k=4 md5-derived positions packed into 4096
    // 32-bit lanes of BIGINT words (a bit_or aggregate — the filter is data),
    // probes are the never-ordered customers, and a probe passes only
    // if all four bits are set. Measured FPR in exact permille; the
    // theoretical (1−e^{−kn/m})^k rounds to 6. The word table
    // broadcasts — membership testing never shuffles the probe side.
    QueryDef.sql(
      "u66_bloom_fpr",
      """WITH members AS (SELECT DISTINCT o_custkey AS key FROM orders),
        |pos AS (
        |  SELECT key, i.i,
        |    CAST(('0x' || substr(md5(CAST(key AS VARCHAR) || '#' || CAST(i.i AS VARCHAR)), 1, 8))::BIGINT
        |      % 131072 AS BIGINT) AS p
        |  FROM members, (SELECT unnest(generate_series(1, 4)) AS i) i),
        |words AS (
        |  SELECT p // 32 AS w, bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS mask
        |  FROM pos GROUP BY 1),
        |probes AS (
        |  SELECT c.c_custkey AS key FROM customer c
        |  WHERE c.c_custkey NOT IN (SELECT key FROM members)),
        |ppos AS (
        |  SELECT key, i.i,
        |    CAST(('0x' || substr(md5(CAST(key AS VARCHAR) || '#' || CAST(i.i AS VARCHAR)), 1, 8))::BIGINT
        |      % 131072 AS BIGINT) AS p
        |  FROM probes, (SELECT unnest(generate_series(1, 4)) AS i) i),
        |hits AS (
        |  SELECT pp.key,
        |    CAST(sum(coalesce((w.mask >> CAST(pp.p % 32 AS INT)) & 1, 0)) AS BIGINT)
        |      AS nbits
        |  FROM ppos pp LEFT JOIN words w ON w.w = pp.p // 32
        |  GROUP BY 1),
        |agg AS (
        |  SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_members,
        |    CAST(count(*) AS BIGINT) AS n_probes,
        |    CAST(sum(CASE WHEN nbits = 4 THEN 1 ELSE 0 END) AS BIGINT) AS false_pos
        |  FROM hits)
        |SELECT n_members, n_probes, false_pos,
        |  CAST(CASE WHEN n_probes > 0 THEN false_pos * 1000 // n_probes
        |    ELSE 0 END AS BIGINT) AS fpr_permille,
        |  round(pow(1 - exp(-(4.0 * n_members) / 131072.0), 4), 6)
        |    AS theo_fpr
        |FROM agg""".stripMargin) { (s, d) =>
      def bpos(key: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
        (conv(substring(md5(concat(key.cast("string"), lit("#"),
          i.cast("string"))), 1, 8), 16, 10).cast("long") % 131072).cast("long")
      val members = Tables.orders(s, d).select(col("o_custkey").as("key")).distinct()
        .localCheckpoint(true) // filter build + count + probe anti-join
      val idx = { import s.implicits._; Seq(1, 2, 3, 4).toDF("i") }
      val pos = members.crossJoin(broadcast(idx))
        .select(col("key"), bpos(col("key"), col("i")).as("p"))
      val words = pos
        .groupBy(expr("p div 32").as("w"))
        .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(p % 32 as int)))")
          .as("mask"))
      val probes = Tables.customer(s, d).select(col("c_custkey").as("key"))
        .join(members, Seq("key"), "left_anti")
      val hits = probes.crossJoin(broadcast(idx))
        .select(col("key"), bpos(col("key"), col("i")).as("p"))
        .join(broadcast(words), expr("p div 32") === col("w"), "left")
        .select(col("key"),
          coalesce(expr("shiftright(mask, cast(p % 32 as int)) & 1"), lit(0L)).as("b"))
        .groupBy(col("key"))
        .agg(sum(col("b")).cast("long").as("nbits"))
      val nm = members.agg(count(lit(1)).as("n_members"))
      hits.agg(count(lit(1)).as("n_probes"),
          sum(when(col("nbits") === 4, 1).otherwise(0)).cast("long").as("false_pos"))
        .crossJoin(broadcast(nm))
        .select(col("n_members"), col("n_probes"), col("false_pos"),
          when(col("n_probes") > 0,
            expr("cast(false_pos * 1000 div n_probes as bigint)"))
            .otherwise(lit(0L)).as("fpr_permille"),
          round(pow(lit(1) - exp((lit(-4.0) * col("n_members")) / lit(131072.0)), 4), 6)
            .as("theo_fpr"))
    }
  )
}
