package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Hundred-tenth frontier batch: Gorilla delta-of-delta timestamp
  * compression sizing, exact Shannon code lengths with a Kraft-sum
  * audit, and two-round fixed-point SimRank on the trade graph.
  */
object Frontier110Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- U84: Gorilla delta-of-delta timestamp sizing --------------------------
    // The TSDB timestamp scheme (Facebook Gorilla, VLDB'15): per user
    // stream ordered by time, store the SECOND DERIVATIVE of the
    // second-granularity timestamps in variable-width buckets —
    // D = 0 -> 1 bit, [-63,64] -> 9, [-255,256] -> 12,
    // [-2047,2048] -> 16, else 36; the first point costs 64 raw bits
    // and the first delta a flat 36 (simplified from the paper's
    // 14-bit aligned-block header — documented deviation). Everything
    // is integer arithmetic on epoch seconds, so the sizing is exact
    // and the per-bucket census shows WHY the scheme works: regular
    // event cadence makes the second derivative cluster at zero.
    QueryDef.sql(
      "u84_gorilla_timestamps",
      """WITH pts AS (
        |  SELECT user_id, epoch_us(ts) // 1000000 AS sec,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS rn
        |  FROM events),
        |d1 AS (
        |  SELECT user_id, rn, sec,
        |    sec - lag(sec) OVER (PARTITION BY user_id ORDER BY rn) AS d
        |  FROM pts),
        |d2 AS (
        |  SELECT user_id, rn, d,
        |    d - lag(d) OVER (PARTITION BY user_id ORDER BY rn) AS dd
        |  FROM d1),
        |bits AS (
        |  SELECT user_id,
        |    CASE WHEN rn = 1 THEN 64 WHEN rn = 2 THEN 36
        |      WHEN dd = 0 THEN 1
        |      WHEN dd BETWEEN -63 AND 64 THEN 9
        |      WHEN dd BETWEEN -255 AND 256 THEN 12
        |      WHEN dd BETWEEN -2047 AND 2048 THEN 16
        |      ELSE 36 END AS b,
        |    CASE WHEN rn <= 2 THEN NULL
        |      WHEN dd = 0 THEN 0
        |      WHEN dd BETWEEN -63 AND 64 THEN 9
        |      WHEN dd BETWEEN -255 AND 256 THEN 12
        |      WHEN dd BETWEEN -2047 AND 2048 THEN 16
        |      ELSE 36 END AS bucket
        |  FROM d2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(count(*) * 64 AS BIGINT) AS raw_bits,
        |  CAST(sum(b) AS BIGINT) AS gorilla_bits,
        |  CAST(sum(b) * 1000 // (count(*) * 64) AS BIGINT) AS ratio_permille,
        |  CAST(count(*) FILTER (WHERE bucket = 0) AS BIGINT) AS zero_dd,
        |  CAST(count(*) FILTER (WHERE bucket = 9) AS BIGINT) AS b9,
        |  CAST(count(*) FILTER (WHERE bucket = 12) AS BIGINT) AS b12,
        |  CAST(count(*) FILTER (WHERE bucket = 16) AS BIGINT) AS b16,
        |  CAST(count(*) FILTER (WHERE bucket = 36) AS BIGINT) AS b36
        |FROM bits GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRn = Window.partitionBy(col("user_id")).orderBy(col("rn"))
      val pts = Tables.events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("sec"),
          col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(wOrd))
      val d2c = pts
        .withColumn("d", col("sec") - lag(col("sec"), 1).over(wRn))
        .withColumn("dd", col("d") - lag(col("d"), 1).over(wRn))
      val bits = d2c.select(col("user_id"),
        when(col("rn") === 1, 64).when(col("rn") === 2, 36)
          .when(col("dd") === 0, 1)
          .when(col("dd").between(-63, 64), 9)
          .when(col("dd").between(-255, 256), 12)
          .when(col("dd").between(-2047, 2048), 16)
          .otherwise(36).as("b"),
        when(col("rn") <= 2, lit(null))
          .when(col("dd") === 0, 0)
          .when(col("dd").between(-63, 64), 9)
          .when(col("dd").between(-255, 256), 12)
          .when(col("dd").between(-2047, 2048), 16)
          .otherwise(36).as("bucket"))
      bits.groupBy(col("user_id"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          (count(lit(1)) * 64).cast("long").as("raw_bits"),
          sum(col("b")).cast("long").as("gorilla_bits"),
          expr("sum(b) * 1000 div (count(1) * 64)").cast("long")
            .as("ratio_permille"),
          count(when(col("bucket") === 0, 1)).cast("long").as("zero_dd"),
          count(when(col("bucket") === 9, 1)).cast("long").as("b9"),
          count(when(col("bucket") === 12, 1)).cast("long").as("b12"),
          count(when(col("bucket") === 16, 1)).cast("long").as("b16"),
          count(when(col("bucket") === 36, 1)).cast("long").as("b36"))
        .orderBy(col("user_id"))
    },

    // ---- T86: Shannon code sizing with Kraft audit -----------------------------
    // Exact Shannon code lengths per source vocabulary WITHOUT a
    // floating log: l_w = ceil(log2(N/c_w)) computed as the bit
    // length of ceil(N/c_w) - 1 (q <= 2^l iff N/c <= 2^l for integer
    // 2^l, so the rational never needs to exist). The Kraft sum
    // sum(2^-l) is audited exactly in units of 2^-40 via shiftleft —
    // Shannon codes always leave slack (they round UP to whole bits),
    // and that slack, reported in permille, is the compressible gap a
    // Huffman or arithmetic coder would claw back. Fixed-length
    // baseline: N * ceil(log2 V) bits via the same bit-length trick.
    QueryDef.sql(
      "t86_shannon_code",
      """WITH tok AS (
        |  SELECT source, unnest(regexp_extract_all(lower(text), '\S+'))
        |    AS term
        |  FROM documents),
        |cnt AS (
        |  SELECT source, term, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |tot AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM cnt GROUP BY 1),
        |code AS (
        |  SELECT c.source, c.c,
        |    CASE WHEN (t.n + c.c - 1) // c.c = 1 THEN 0
        |      ELSE CAST(length(bin((t.n + c.c - 1) // c.c - 1)) AS BIGINT)
        |      END AS l
        |  FROM cnt c JOIN tot t ON t.source = c.source)
        |SELECT t.source, t.v AS vocab, t.n AS total_tokens,
        |  CAST(sum(co.c * co.l) AS BIGINT) AS shannon_bits,
        |  CAST(t.n * (CASE WHEN t.v = 1 THEN 0
        |    ELSE CAST(length(bin(t.v - 1)) AS BIGINT) END) AS BIGINT)
        |    AS fixed_bits,
        |  CAST(sum(co.c * co.l) * 1000 // t.n AS BIGINT)
        |    AS millibits_per_token,
        |  CAST(((1::BIGINT << 40) - sum(1::BIGINT << (40 - co.l))) * 1000
        |    // (1::BIGINT << 40) AS BIGINT) AS kraft_slack_permille
        |FROM code co JOIN tot t ON t.source = co.source
        |GROUP BY t.source, t.v, t.n
        |ORDER BY t.source""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(TextFunctions.tokens(col("text"))).as("term"))
      val cnt = tok.groupBy(col("source"), col("term"))
        .agg(count(lit(1)).cast("long").as("c"))
      val tot = cnt.groupBy(col("source"))
        .agg(sum(col("c")).cast("long").as("n"), count(lit(1)).cast("long").as("v"))
      val code = cnt.join(broadcast(tot), Seq("source"))
        .select(col("source"), col("c"), col("n"), col("v"),
          when(expr("(n + c - 1) div c") === 1, 0L)
            .otherwise(length(bin(expr("(n + c - 1) div c - 1"))).cast("long"))
            .as("l"))
      code.groupBy(col("source"), col("v").as("vocab"), col("n").as("total_tokens"))
        .agg(sum(col("c") * col("l")).cast("long").as("shannon_bits"),
          expr("sum(cast(1 as bigint) << (40 - cast(l as int)))").as("kraft"))
        .select(col("source"), col("vocab"), col("total_tokens"),
          col("shannon_bits"),
          (col("total_tokens") *
            when(col("vocab") === 1, 0L)
              .otherwise(length(bin(col("vocab") - 1)).cast("long")))
            .cast("long").as("fixed_bits"),
          expr("shannon_bits * 1000 div total_tokens").cast("long")
            .as("millibits_per_token"),
          expr("((cast(1 as bigint) << 40) - kraft) * 1000 " +
            "div (cast(1 as bigint) << 40)").cast("long")
            .as("kraft_slack_permille"))
        .orderBy(col("source"))
    },

    // ---- A176: two-round fixed-point SimRank -----------------------------------
    // "Two nations are similar when similar nations ship to them":
    // SimRank (Jeh & Widom, KDD'02) on the supplier->customer nation
    // trade graph, C = 0.8, two rounds, micro-units throughout.
    // Round 1 collapses to common-in-neighbor counting because
    // s0 = I; round 2 averages round-1 scores over the full
    // in-neighborhood cross product — a quadruple join that stays
    // cheap at ANY scale factor because the node space is the fixed
    // 25-nation lattice (the SF-sized fact table only weights which
    // edges exist). Multiplying by C as *4 div 5 keeps the
    // truncation sequence identical in both engines.
    QueryDef.sql(
      "a176_simrank",
      """WITH e AS MATERIALIZED (
        |  SELECT DISTINCT s.s_nationkey AS src, c.c_nationkey AS dst
        |  FROM lineitem l
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  WHERE s.s_nationkey <> c.c_nationkey),
        |deg AS (SELECT dst, CAST(count(*) AS BIGINT) AS ind
        |        FROM e GROUP BY 1),
        |common AS (
        |  SELECT e1.dst AS a, e2.dst AS b, CAST(count(*) AS BIGINT) AS com
        |  FROM e e1 JOIN e e2 ON e2.src = e1.src
        |  WHERE e1.dst <> e2.dst
        |  GROUP BY 1, 2),
        |s1 AS MATERIALIZED (
        |  SELECT da.dst AS a, db.dst AS b,
        |    CASE WHEN da.dst = db.dst THEN 1000000
        |      ELSE coalesce(c.com, 0) * 800000 // (da.ind * db.ind)
        |      END AS s1
        |  FROM deg da CROSS JOIN deg db
        |  LEFT JOIN common c ON c.a = da.dst AND c.b = db.dst),
        |s2 AS (
        |  SELECT ea.dst AS a, eb.dst AS b,
        |    CAST(sum(s.s1) * 4 // 5 // (da.ind * db.ind) AS BIGINT) AS s2
        |  FROM e ea JOIN e eb ON ea.dst <> eb.dst
        |  JOIN s1 s ON s.a = ea.src AND s.b = eb.src
        |  JOIN deg da ON da.dst = ea.dst
        |  JOIN deg db ON db.dst = eb.dst
        |  GROUP BY ea.dst, eb.dst, da.ind, db.ind)
        |SELECT na.n_name AS nation_a, nb.n_name AS nation_b,
        |  CAST(coalesce(s1.s1, 0) AS BIGINT) AS s1_micro, s2.s2 AS s2_micro
        |FROM s2
        |JOIN s1 ON s1.a = s2.a AND s1.b = s2.b
        |JOIN nation na ON na.n_nationkey = s2.a
        |JOIN nation nb ON nb.n_nationkey = s2.b
        |WHERE s2.a < s2.b AND s2.s2 > 0
        |ORDER BY nation_a, nation_b""".stripMargin) { (s, d) =>
      val e = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)
          .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .filter(col("s_nationkey") =!= col("c_nationkey"))
        .select(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .distinct()
        .localCheckpoint(true) // <= 600 edges feeding four downstream joins
      val deg = e.groupBy(col("dst")).agg(count(lit(1)).cast("long").as("ind"))
      val common = e.as("e1")
        .join(e.as("e2"), col("e2.src") === col("e1.src"))
        .filter(col("e1.dst") =!= col("e2.dst"))
        .groupBy(col("e1.dst").as("a"), col("e2.dst").as("b"))
        .agg(count(lit(1)).cast("long").as("com"))
      // broadcast the 25-row side explicitly: deg's lineage roots in a
      // localCheckpoint (no size stats), so the planner would otherwise
      // fall back to CartesianProduct instead of a bounded BNLJ
      val s1 = deg.select(col("dst").as("a"), col("ind").as("ia"))
        .crossJoin(broadcast(deg.select(col("dst").as("b"), col("ind").as("ib"))))
        .join(common, Seq("a", "b"), "left")
        .select(col("a"), col("b"),
          when(col("a") === col("b"), 1000000L)
            .otherwise(expr("coalesce(com, 0) * 800000 div (ia * ib)"))
            .as("s1"))
        .localCheckpoint(true) // 625-row similarity table joined twice in round 2
      val s2 = e.select(col("src").as("ia_src"), col("dst").as("a2"))
        .join(broadcast(e.select(col("src").as("ib_src"), col("dst").as("b2"))),
          col("a2") =!= col("b2"))
        .join(s1.select(col("a").as("ia_src"), col("b").as("ib_src"),
          col("s1").as("s1v")), Seq("ia_src", "ib_src"))
        .join(deg.select(col("dst").as("a2"), col("ind").as("da")), Seq("a2"))
        .join(deg.select(col("dst").as("b2"), col("ind").as("db")), Seq("b2"))
        .groupBy(col("a2"), col("b2"), col("da"), col("db"))
        .agg(expr("sum(s1v) * 4 div 5 div (da * db)").cast("long").as("s2"))
      s2.join(s1.select(col("a").as("a2"), col("b").as("b2"),
          col("s1").as("s1f")), Seq("a2", "b2"))
        .filter(col("a2") < col("b2") && col("s2") > 0)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("a2"), col("n_name").as("nation_a"))),
          Seq("a2"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("b2"), col("n_name").as("nation_b"))),
          Seq("b2"))
        .select(col("nation_a"), col("nation_b"),
          coalesce(col("s1f"), lit(0L)).cast("long").as("s1_micro"),
          col("s2").as("s2_micro"))
        .orderBy(col("nation_a"), col("nation_b"))
    }
  )
}
