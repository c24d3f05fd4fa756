package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.operators.ShardedRank

/** Fifteenth frontier batch: dominant-eigenvector power iteration under
  * the exact-hash gate (the d7 fixed-point trick applied to linear
  * algebra) and RFM customer segmentation over sharded ranks.
  */
object Frontier15Queries {

  /** 3 power-iteration rounds over the quantized Gram matrix, exact. */
  private val powerRounds = 3
  private val powerDim = 64

  val defs: Seq[QueryDef] = Seq(

    // ---- V18: power iteration (dominant PCA direction), exact -------------
    // Iterative float linear algebra normally can't be oracle-checked
    // (1-ulp divergence amplifies per round). Same cure as d7's
    // PageRank: quantize once (floor(x·1e6) — float→double widening is
    // exact and the IEEE product is identical in both engines), then
    // every round is INTEGER arithmetic: dot products are exact BIGINT
    // folds, per-dim contribution sums are exact DECIMAL(38,0), and
    // the normalization v' = sign(s)·((|s|·1e9) div max|s|) divides
    // positive exact integers — bit-reproducible in any engine.
    //
    // Scale shape per round: ONE corpus scan (zip_with dot against the
    // 64-long broadcast literal v, posexplode, partial-agg shuffle on
    // 64 dim keys); only the 64 s-values return to the driver to build
    // the next round's literal. X^T X (64×64) is never materialized —
    // the matrix-free formulation is what survives 100 TB × 64 dims.
    QueryDef.sql(
      "v18_power_iteration", {
        def round(qn: String, vIn: String, vOut: String): String =
          s"""dot_$vOut AS (
             |  SELECT vec_id, CAST(SUM(qj * v) AS BIGINT) AS dot
             |  FROM $qn JOIN $vIn USING (dim) GROUP BY vec_id),
             |s_$vOut AS (
             |  SELECT dim, SUM(CAST(dot AS HUGEINT) * qj) AS sv
             |  FROM $qn JOIN dot_$vOut USING (vec_id) GROUP BY dim),
             |$vOut AS (
             |  SELECT dim, (CASE WHEN sv < 0 THEN -1 ELSE 1 END) *
             |    ((abs(sv) * 1000000000) // (SELECT max(abs(sv)) FROM s_$vOut)) AS v
             |  FROM s_$vOut)""".stripMargin
        s"""WITH idx AS (SELECT unnest(generate_series(1, $powerDim)) AS dim),
           |q AS (
           |  SELECT vec_id, dim,
           |    CAST(floor(CAST(embedding[dim] AS DOUBLE) * 1000000.0) AS BIGINT) AS qj
           |  FROM embeddings CROSS JOIN idx),
           |v1 AS (SELECT dim, CAST(1000000000 AS HUGEINT) AS v FROM idx),
           |${round("q", "v1", "v2")},
           |${round("q", "v2", "v3")},
           |${round("q", "v3", "v4")}
           |SELECT dim, CAST(v AS BIGINT) AS v_unit FROM v4""".stripMargin
      }) { (s, d) =>
      val q = Tables.embeddings(s, d).select(
        col("vec_id"),
        expr(s"transform(embedding, x -> cast(floor(cast(x as double) * 1000000.0d) as bigint))")
          .as("q"))
      var v: Array[BigInt] = Array.fill(powerDim)(BigInt(1000000000L))
      for (_ <- 1 to powerRounds) {
        val vlit = typedlit(v.map(_.toLong).toSeq)
        val withDot = q.withColumn("dot",
          aggregate(zip_with(col("q"), vlit, (a, b) => a * b), lit(0L), (acc, x) => acc + x))
        val sRows = withDot
          .select(posexplode(col("q")).as(Seq("pos", "qj")), col("dot"))
          .groupBy((col("pos") + 1).as("dim"))
          .agg(sum(col("dot").cast(DecimalType(38, 0)) * col("qj")).as("sv"))
          .collect()
        val sArr = Array.ofDim[BigInt](powerDim)
        sRows.foreach(r => sArr(r.getInt(0) - 1) = r.getDecimal(1).toBigInteger)
        val m = sArr.map(_.abs).max
        // positive-operand truncating division — same rule as the SQL //
        v = sArr.map(x => x.sign * ((x.abs * BigInt(1000000000L)) / m))
      }
      import s.implicits._
      v.zipWithIndex.map { case (u, i) => (i + 1, u.toLong) }.toSeq
        .toDF("dim", "v_unit")
    },

    // ---- A47: RFM customer segmentation -----------------------------------
    // The classic CRM readout: every ordering customer scores
    // Recency / Frequency / Monetary quintiles (1 = best), and the
    // report is the 5×5×5 segment rollup. Each quintile assignment is
    // a GLOBAL rank — all three run through ShardedRank (range-shard +
    // partitioned local rank + broadcast offsets), so no customer-
    // grain data crosses one task; the quintile is then the c12
    // closed form ((rank-1)·5) div n + 1. Monetary stays in exact
    // integer cents until the single final division.
    QueryDef.sql(
      "a47_rfm_segments",
      """WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref_day FROM orders),
        |cust AS (
        |  SELECT o_custkey,
        |    date_diff('day', max(CAST(o_orderdate AS DATE)), (SELECT ref_day FROM ref))
        |      AS recency,
        |    CAST(count(*) AS BIGINT) AS freq,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 100 AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM cust),
        |rk AS (
        |  SELECT o_custkey, cents,
        |    row_number() OVER (ORDER BY recency, o_custkey) AS r_rk,
        |    row_number() OVER (ORDER BY freq DESC, o_custkey) AS f_rk,
        |    row_number() OVER (ORDER BY cents DESC, o_custkey) AS m_rk
        |  FROM cust)
        |SELECT
        |  CAST(((r_rk - 1) * 5) // n AS INTEGER) + 1 AS r_q,
        |  CAST(((f_rk - 1) * 5) // n AS INTEGER) + 1 AS f_q,
        |  CAST(((m_rk - 1) * 5) // n AS INTEGER) + 1 AS m_q,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(CAST(sum(cents) AS DOUBLE) / 100.0 AS DOUBLE) AS monetary
        |FROM rk CROSS JOIN n
        |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
      val orders = Tables.orders(s, d)
      val ref = orders.agg(max(col("o_orderdate").cast("date")).as("ref_day"))
      val cust = orders
        .groupBy(col("o_custkey"))
        .agg(
          max(col("o_orderdate").cast("date")).as("last_day"),
          count(lit(1)).as("freq"),
          sum((col("o_totalprice").cast(DecimalType(18, 4)) * 100).cast("long"))
            .as("cents"))
        .crossJoin(broadcast(ref))
        .select(col("o_custkey"), datediff(col("ref_day"), col("last_day")).as("recency"),
          col("freq"), col("cents"))
      val n = cust.agg(count(lit(1)).as("n"))
      // one persisted base + one count shared by all three rankings
      // (withRanks), instead of a fold of withRank calls that each
      // re-materialize and re-count the widening chain
      val ranked = ShardedRank.withRanks(cust,
        "r_rk" -> Seq(col("recency"), col("o_custkey")),
        "f_rk" -> Seq(col("freq").desc, col("o_custkey")),
        "m_rk" -> Seq(col("cents").desc, col("o_custkey")))
      ranked.crossJoin(broadcast(n))
        .select(
          (expr("((r_rk - 1) * 5) div n").cast("int") + 1).as("r_q"),
          (expr("((f_rk - 1) * 5) div n").cast("int") + 1).as("f_q"),
          (expr("((m_rk - 1) * 5) div n").cast("int") + 1).as("m_q"),
          col("cents"))
        .groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_customers"),
          (sum(col("cents")).cast("double") / 100.0).as("monetary"))
    }
  )
}
