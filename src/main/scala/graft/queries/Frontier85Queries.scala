package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Eighty-fifth frontier batch: materialized-view rollup answering,
  * hierarchical forecast reconciliation, Adjusted Rand Index.
  */
object Frontier85Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- U67: materialized-view rollup answering ------------------------------
    // The MV-matching rewrite every warehouse optimizer performs: a
    // (nation, year) revenue summary is materialized once, and a
    // COARSER query — revenue by (region, year) — is answered entirely
    // FROM the summary by rolling SUM and COUNT up the nation→region
    // hierarchy (AVG recomposes as rolled-sum div rolled-count, never
    // an average of averages). The oracle answers the same question
    // from the base fact table — the hash gate certifies the rollup's
    // compositionality. At 100 TB the MV is orders of magnitude
    // smaller than the facts; the registered plan touches facts once
    // to build it and answers from the summary.
    QueryDef.sql(
      "u67_mv_rollup_answer",
      """SELECT r.r_name, CAST(year(CAST(o.o_orderdate AS DATE)) AS INT) AS yr,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS rev_cents,
        |  CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
        |    // count(*) AS BIGINT) AS avg_cents
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      // the materialized view: fine-grain (nation, year) summary
      val mv = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"),
          year(col("o_orderdate").cast("date")).cast("int").as("yr"))
        .agg(count(lit(1)).as("mv_n"),
          sum(floor(col("o_totalprice") * 100).cast("long")).as("mv_cents"))
        .localCheckpoint(true) // the "stored" summary the query answers from
      mv.join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("yr"))
        .agg(sum(col("mv_n")).cast("long").as("n_orders"),
          sum(col("mv_cents")).cast("long").as("rev_cents"))
        .select(col("r_name"), col("yr"), col("n_orders"), col("rev_cents"),
          expr("cast(rev_cents div n_orders as bigint)").as("avg_cents"))
        .orderBy(col("r_name"), col("yr"))
    },

    // ---- W23: hierarchical forecast reconciliation ----------------------------
    // Forecasts made independently at two hierarchy levels disagree:
    // per-nation naive forecasts (last full year's revenue) don't sum
    // to the region target (mean of the last TWO years, a different
    // method). Top-down reconciliation distributes each region's
    // target across its nations proportionally to their base
    // forecasts using LARGEST-REMAINDER apportionment — the exact
    // integer scheme (floor the quotas, award leftover cents to the
    // biggest remainders, nation name breaking ties) — so the
    // reconciled forecasts sum to the target BY CONSTRUCTION, with
    // every step integer arithmetic.
    QueryDef.sql(
      "w23_hier_reconcile",
      """WITH f AS (
        |  SELECT c.c_nationkey AS nk,
        |    CAST(year(CAST(o.o_orderdate AS DATE)) AS INT) AS yr,
        |    CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |my AS (SELECT max(yr) AS y FROM f),
        |base AS (
        |  SELECT f.nk, f.cents AS fc FROM f CROSS JOIN my WHERE f.yr = my.y - 1),
        |rtgt AS (
        |  SELECT n.n_regionkey AS rk,
        |    CAST(sum(CASE WHEN f.yr >= my.y - 2 AND f.yr <= my.y - 1
        |      THEN f.cents ELSE 0 END) // 2 AS BIGINT) AS tgt
        |  FROM f JOIN nation n ON f.nk = n.n_nationkey CROSS JOIN my
        |  GROUP BY 1),
        |w AS (
        |  SELECT b.nk, n.n_name, n.n_regionkey AS rk, b.fc, r.tgt,
        |    CAST(sum(b.fc) OVER (PARTITION BY n.n_regionkey) AS BIGINT) AS rsum
        |  FROM base b JOIN nation n ON b.nk = n.n_nationkey
        |  JOIN rtgt r ON r.rk = n.n_regionkey),
        |quota AS (
        |  SELECT nk, n_name, rk, fc, tgt,
        |    CAST(CAST(tgt AS HUGEINT) * fc // rsum AS BIGINT) AS alloc0,
        |    CAST(CAST(tgt AS HUGEINT) * fc % rsum AS BIGINT) AS rem
        |  FROM w),
        |extra AS (
        |  SELECT rk, CAST(max(tgt) - sum(alloc0) AS BIGINT) AS seats FROM quota
        |  GROUP BY 1),
        |ranked AS (
        |  SELECT q.*, row_number() OVER (PARTITION BY q.rk
        |    ORDER BY q.rem DESC, q.n_name) AS rr
        |  FROM quota q)
        |SELECT r.n_name, CAST(r.fc AS BIGINT) AS base_forecast_cents,
        |  CAST(r.alloc0 + CASE WHEN r.rr <= e.seats THEN 1 ELSE 0 END AS BIGINT)
        |    AS reconciled_cents
        |FROM ranked r JOIN extra e ON e.rk = r.rk
        |ORDER BY r.n_name""".stripMargin) { (s, d) =>
      val f = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey").as("nk"),
          year(col("o_orderdate").cast("date")).cast("int").as("yr"))
        .agg(sum(floor(col("o_totalprice") * 100).cast("long")).cast("long")
          .as("cents"))
        .localCheckpoint(true) // base forecasts and targets read one rollup
      val my = f.agg(max(col("yr")).as("y"))
      val base = f.crossJoin(broadcast(my)).filter(col("yr") === col("y") - 1)
        .select(col("nk"), col("cents").as("fc"))
      val nations = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey")))
      val rtgt = f.crossJoin(broadcast(my))
        .join(nations, col("nk") === col("n_nationkey"))
        .groupBy(col("n_regionkey").as("rk"))
        .agg(expr("cast(sum(CASE WHEN yr >= y - 2 AND yr <= y - 1 THEN cents ELSE 0 END) div 2 as bigint)")
          .as("tgt"))
      val w = base.join(nations, col("nk") === col("n_nationkey"))
        .join(broadcast(rtgt), col("rk") === col("n_regionkey"))
        .withColumn("rsum", sum(col("fc"))
          .over(Window.partitionBy(col("n_regionkey"))).cast("long"))
      val quota = w.select(col("nk"), col("n_name"), col("rk"), col("fc"), col("tgt"),
        expr("cast(cast(tgt as decimal(38,0)) * fc div rsum as bigint)").as("alloc0"),
        expr("cast(cast(tgt as decimal(38,0)) * fc % rsum as bigint)").as("rem"))
        .localCheckpoint(true) // seats and ranks read one quota pass
      val extra = quota.groupBy(col("rk"))
        .agg((max(col("tgt")) - sum(col("alloc0"))).cast("long").as("seats"))
      quota
        .withColumn("rr", row_number().over(Window.partitionBy(col("rk"))
          .orderBy(col("rem").desc, col("n_name"))).cast("long"))
        .join(broadcast(extra), "rk")
        .select(col("n_name"), col("fc").cast("long").as("base_forecast_cents"),
          (col("alloc0") + when(col("rr") <= col("seats"), 1).otherwise(0))
            .cast("long").as("reconciled_cents"))
        .orderBy(col("n_name"))
    },

    // ---- V52: Adjusted Rand Index between partitions --------------------------
    // How well does the unsupervised 3-sign-bit partition (dims 1–3
    // binarized — 8 buckets) recover the true labels? ARI from the
    // contingency table, computed as EXACT integers by multiplying
    // through by C(n,2): ari_micro = 10⁶·2·(C·I − A·B) div
    // (C·(A+B) − 2·A·B) where I = Σ C(n_ij,2), A/B the row/column
    // pair-sums — the chance-corrected partition agreement used to
    // evaluate any clustering, with zero floating point.
    QueryDef.sql(
      "v52_adjusted_rand",
      """WITH pt AS (
        |  SELECT label,
        |    (CASE WHEN CAST(embedding[1] AS DOUBLE) >= 0 THEN 4 ELSE 0 END
        |     + CASE WHEN CAST(embedding[2] AS DOUBLE) >= 0 THEN 2 ELSE 0 END
        |     + CASE WHEN CAST(embedding[3] AS DOUBLE) >= 0 THEN 1 ELSE 0 END)
        |      AS bucket
        |  FROM embeddings),
        |cont AS (
        |  SELECT label, bucket, CAST(count(*) AS BIGINT) AS nij
        |  FROM pt GROUP BY 1, 2),
        |ii AS (SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS i FROM cont),
        |ra AS (SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS a FROM
        |  (SELECT CAST(sum(nij) AS BIGINT) AS ai FROM cont GROUP BY label)),
        |rb AS (SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS b FROM
        |  (SELECT CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY bucket)),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pt)
        |SELECT nn.n, ii.i AS pair_agree, ra.a AS pairs_u, rb.b AS pairs_v,
        |  CAST(1000000 * 2 * ((nn.n * (nn.n - 1) // 2) * ii.i - ra.a * rb.b)
        |    // ((nn.n * (nn.n - 1) // 2) * (ra.a + rb.b) - 2 * ra.a * rb.b)
        |    AS BIGINT) AS ari_micro
        |FROM nn CROSS JOIN ii CROSS JOIN ra CROSS JOIN rb""".stripMargin) { (s, d) =>
      val pt = Tables.embeddings(s, d)
        .select(col("label"),
          (when(expr("cast(embedding[0] as double)") >= 0, 4).otherwise(0)
            + when(expr("cast(embedding[1] as double)") >= 0, 2).otherwise(0)
            + when(expr("cast(embedding[2] as double)") >= 0, 1).otherwise(0))
            .as("bucket"))
      val cont = pt.groupBy(col("label"), col("bucket"))
        .agg(count(lit(1)).as("nij"))
        .localCheckpoint(true) // three pair-sums read one contingency pass
      val ii = cont.agg(sum(expr("nij * (nij - 1) div 2")).cast("long").as("i"))
      val ra = cont.groupBy(col("label")).agg(sum(col("nij")).as("ai"))
        .agg(sum(expr("ai * (ai - 1) div 2")).cast("long").as("a"))
      val rb = cont.groupBy(col("bucket")).agg(sum(col("nij")).as("bj"))
        .agg(sum(expr("bj * (bj - 1) div 2")).cast("long").as("b"))
      val nn = pt.agg(count(lit(1)).as("n"))
      nn.crossJoin(broadcast(ii)).crossJoin(broadcast(ra)).crossJoin(broadcast(rb))
        .select(col("n"), col("i").as("pair_agree"),
          col("a").as("pairs_u"), col("b").as("pairs_v"),
          expr("""cast(1000000 * 2 * ((n * (n - 1) div 2) * i - a * b)
            div ((n * (n - 1) div 2) * (a + b) - 2 * a * b) as bigint)""")
            .as("ari_micro"))
    }
  )
}
