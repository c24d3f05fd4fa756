package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Eighty-third frontier batch: variance-weighted stratified allocation,
  * personalized PageRank, audio constellation fingerprint matching.
  */
object Frontier83Queries {

  /** Three unrolled PPR rounds in nano-units over the bipartite
    * customer↔supplier graph (node id = 2·custkey / 2·suppkey+1).
    */
  private val pprOracle: String = {
    def round(prev: String, out: String): String =
      s"""$out AS (
        |  SELECT node, CAST(sum(r) AS BIGINT) AS r FROM (
        |    SELECT e.dst AS node,
        |      p.r * 850 // 1000 // d.deg AS r
        |    FROM $prev p JOIN edges e ON e.src = p.node
        |    JOIN deg d ON d.node = p.node
        |    UNION ALL
        |    SELECT node, 1000000000000 * 150 // 1000 // (SELECT ns FROM nseed) AS r
        |    FROM seeds) GROUP BY node)""".stripMargin
    s"""WITH pairs AS (
      |  SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |edges AS (
      |  SELECT ck * 2 AS src, sk * 2 + 1 AS dst FROM pairs
      |  UNION ALL
      |  SELECT sk * 2 + 1 AS src, ck * 2 AS dst FROM pairs),
      |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
      |  FROM edges GROUP BY 1),
      |seeds AS (
      |  SELECT DISTINCT c.c_custkey * 2 AS node
      |  FROM customer c JOIN pairs p ON p.ck = c.c_custkey
      |  WHERE c.c_nationkey = 0),
      |nseed AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM seeds),
      |r0 AS (
      |  SELECT node, CAST(1000000000000 // (SELECT ns FROM nseed) AS BIGINT) AS r
      |  FROM seeds),
      |${round("r0", "r1")},
      |${round("r1", "r2")},
      |${round("r2", "r3")}
      |SELECT CAST(node // 2 AS BIGINT) AS s_suppkey, CAST(r AS BIGINT) AS rank_nano
      |FROM r3 WHERE node % 2 = 1
      |ORDER BY r DESC, node LIMIT 20""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- C49: variance-weighted stratified allocation -------------------------
    // Sampling design, not sampling: split a fixed budget of 100 draws
    // across source strata proportionally to N_h·V_h (Neyman-style,
    // with the exact integer variance numerator n·Σx²−(Σx)² standing
    // in for N·S) using LARGEST-REMAINDER rounding — floor the exact
    // integer quotas, then hand the leftover seats to the largest
    // integer remainders (stratum name breaks ties). Every quota,
    // remainder, and seat is integer arithmetic: an apportionment
    // algorithm under the hash gate.
    QueryDef.sql(
      "c49_variance_allocation",
      """WITH st AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_h,
        |    CAST(count(*) * sum(n_chars * n_chars) - sum(n_chars) * sum(n_chars)
        |      AS BIGINT) AS vnum
        |  FROM documents GROUP BY 1),
        |w AS (SELECT source, n_h, n_h * vnum AS wq FROM st),
        |tw AS (SELECT CAST(sum(wq) AS BIGINT) AS tot FROM w),
        |quota AS (
        |  SELECT source, n_h, wq,
        |    CAST(100 * wq // tw.tot AS BIGINT) AS base,
        |    CAST(100 * wq - (100 * wq // tw.tot) * tw.tot AS BIGINT) AS rem
        |  FROM w CROSS JOIN tw),
        |seats AS (
        |  SELECT CAST(100 - sum(base) AS BIGINT) AS extra FROM quota),
        |ranked AS (
        |  SELECT source, n_h, base, rem,
        |    row_number() OVER (ORDER BY rem DESC, source) AS rr
        |  FROM quota)
        |SELECT r.source, r.n_h,
        |  CAST(r.base + CASE WHEN r.rr <= s.extra THEN 1 ELSE 0 END AS BIGINT)
        |    AS alloc
        |FROM ranked r CROSS JOIN seats s
        |ORDER BY r.source""".stripMargin) { (s, d) =>
      val st = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_h"),
          (count(lit(1)) * sum(col("n_chars") * col("n_chars")) -
            sum(col("n_chars")) * sum(col("n_chars"))).cast("long").as("vnum"))
        .select(col("source"), col("n_h"), (col("n_h") * col("vnum")).as("wq"))
        .localCheckpoint(true) // quotas and the total read one profile pass
      val tw = st.agg(sum(col("wq")).cast("long").as("tot"))
      val quota = st.crossJoin(broadcast(tw))
        .select(col("source"), col("n_h"),
          expr("cast(100 * wq div tot as bigint)").as("base"),
          expr("cast(100 * wq - (100 * wq div tot) * tot as bigint)").as("rem"))
      val seats = quota.agg((lit(100) - sum(col("base"))).cast("long").as("extra"))
      quota
        .withColumn("rr", row_number().over(Window.orderBy(col("rem").desc,
          col("source"))).cast("long")) // strata count is tiny: bounded window
        .crossJoin(broadcast(seats))
        .select(col("source"), col("n_h"),
          (col("base") + when(col("rr") <= col("extra"), 1).otherwise(0))
            .cast("long").as("alloc"))
        .orderBy(col("source"))
    },

    // ---- V51: personalized PageRank recommendations ---------------------------
    // The recommender primitive: random-walk-with-restart from a SEED
    // SET (nation-0 customers) over the bipartite customer↔supplier
    // purchase graph, surfacing the suppliers most reachable from that
    // cohort. Like d7, the recurrence runs in fixed-point nano-units
    // (damping 0.85 as ·850 div 1000, per-degree split as integer
    // div), so three iterative rounds stay bit-exact cross-engine.
    // Rank state is one row per node — broadcast against the edge
    // list every round; edges never reshuffle.
    QueryDef.sql("v51_personalized_pagerank", pprOracle) { (s, d) =>
      val pairs = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
        .localCheckpoint(true) // edge base for both directions + seeds
      val edges = pairs.select((col("ck") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .unionByName(pairs.select((col("sk") * 2 + 1).as("src"), (col("ck") * 2).as("dst")))
        .localCheckpoint(true)
      // r5 opt: deg is loop-invariant; without the checkpoint every
      // round's broadcast build re-ran the edge-wide degree aggregation
      // inside its lineage (3 extra passes over the edge list).
      val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
        .localCheckpoint(true)
      val seeds = Tables.customer(s, d)
        .filter(col("c_nationkey") === 0)
        .select((col("c_custkey") * 2).as("node"))
        .join(pairs.select((col("ck") * 2).as("node")).distinct(), Seq("node"), "left_semi")
        .localCheckpoint(true)
      val nseed = seeds.agg(count(lit(1)).as("ns"))
      val restart = seeds.crossJoin(broadcast(nseed))
        .select(col("node"), expr("1000000000000 * 150 div 1000 div ns").as("r"))
      var rank = seeds.crossJoin(broadcast(nseed))
        .select(col("node"), expr("1000000000000 div ns").as("r"))
        .localCheckpoint(true)
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(broadcast(rank.join(deg, "node")), col("src") === col("node"))
          .select(col("dst").as("node"), expr("r * 850 div 1000 div deg").as("r"))
        rank = contrib.unionByName(restart)
          .groupBy(col("node")).agg(sum(col("r")).cast("long").as("r"))
          .localCheckpoint(true)
      }
      rank.filter(col("node") % 2 === 1)
        .select(expr("cast(node div 2 as bigint)").as("s_suppkey"),
          col("r").cast("long").as("rank_nano"), col("node"))
        .orderBy(col("rank_nano").desc, col("node"))
        .limit(20)
        .drop("node")
    },

    // ---- M12: audio constellation fingerprint matching ------------------------
    // Shazam-shape robust matching on the stub codec's sample stream:
    // 16-sample windows at hop 8 each yield a LANDMARK (peak value +
    // first peak position); consecutive landmarks pair into integer
    // constellation hashes; assets sharing ≥3 hashes match. The join
    // is hash-bucketed (candidates meet only inside a bucket — the
    // banding shape), so matching never goes all-pairs. Shared 48-char
    // prefixes yield exactly the 4 aligned early hashes that clear the
    // threshold.
    QueryDef.sql(
      "m12_audio_fingerprint",
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    list_transform(string_split_regex(substring(text, 1, 128), ''),
        |      ch -> ascii(ch)) AS codes
        |  FROM documents WHERE doc_id % 3 = 2),
        |w AS (
        |  SELECT asset_id, codes,
        |    unnest(generate_series(0, (len(codes) - 16) // 8)) AS widx
        |  FROM a WHERE len(codes) >= 16),
        |lm AS (
        |  SELECT asset_id, CAST(widx AS INT) AS widx,
        |    CAST(list_reduce(codes[widx * 8 + 1 : widx * 8 + 16],
        |      (x, y) -> greatest(x, y)) AS BIGINT) AS pv,
        |    CAST(list_position(codes[widx * 8 + 1 : widx * 8 + 16],
        |      list_reduce(codes[widx * 8 + 1 : widx * 8 + 16],
        |        (x, y) -> greatest(x, y))) AS BIGINT) AS pp
        |  FROM w),
        |fp AS (
        |  SELECT DISTINCT l1.asset_id,
        |    ((l1.pv * 16 + l1.pp) * 256 + l2.pv) * 16 + l2.pp AS h
        |  FROM lm l1 JOIN lm l2
        |    ON l1.asset_id = l2.asset_id AND l2.widx = l1.widx + 1),
        |m AS (
        |  SELECT f1.asset_id AS a_id, f2.asset_id AS b_id,
        |    CAST(count(*) AS BIGINT) AS n_shared
        |  FROM fp f1 JOIN fp f2 ON f1.h = f2.h AND f1.asset_id < f2.asset_id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id, n_shared FROM m WHERE n_shared >= 3
        |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      val a = Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 2)
        .select(col("doc_id").as("asset_id"),
          expr("transform(split(substring(text, 1, 128), ''), ch -> ascii(ch))")
            .as("codes"))
        .filter(size(col("codes")) >= 16)
      val lm = a
        .select(col("asset_id"), col("codes"),
          explode(sequence(lit(0), expr("(size(codes) - 16) div 8"))).as("widx"))
        .select(col("asset_id"), col("widx").cast("int").as("widx"),
          expr("slice(codes, widx * 8 + 1, 16)").as("wc"))
        .select(col("asset_id"), col("widx"),
          expr("cast(array_max(wc) as bigint)").as("pv"),
          expr("cast(array_position(wc, array_max(wc)) as bigint)").as("pp"))
        .localCheckpoint(true) // consecutive-landmark self-join reads it twice
      val fp = lm.alias("l1")
        .join(lm.select(col("asset_id").as("aid2"), col("widx").as("w2"),
          col("pv").as("pv2"), col("pp").as("pp2")),
          col("asset_id") === col("aid2") && col("w2") === col("widx") + 1)
        .select(col("asset_id"),
          (((col("pv") * 16 + col("pp")) * 256 + col("pv2")) * 16 + col("pp2"))
            .as("h"))
        .distinct()
      fp.alias("f1")
        .join(fp.select(col("asset_id").as("b_id"), col("h")), "h")
        .filter(col("asset_id") < col("b_id"))
        .groupBy(col("asset_id").as("a_id"), col("b_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 3)
        .orderBy(col("a_id"), col("b_id"))
    }
  )
}
