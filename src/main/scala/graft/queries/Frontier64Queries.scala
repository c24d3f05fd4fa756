package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Sixty-fourth frontier batch: V-optimal histogram construction,
  * sign-LSH embedding near-dup, bag-semantics set operators.
  */
object Frontier64Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A123: V-optimal histogram (dynamic program in plan space) ----------
    // The optimizer-internals classic: split the 30-day revenue series
    // into 4 buckets minimizing total within-bucket SSE. The DP
    // E_k(i) = min_j E_{k-1}(j) + SSE(j+1..i) unrolls as three join
    // layers over the (i, j) grid — crumb-scale (≤ 900 cells/layer)
    // once the series collapses to prefix sums. Costs are the floor-
    // quantized exact form ssq − s² div m (deterministic in any
    // engine; ties break toward the smaller split). Output: the four
    // boundaries recovered by argmin traceback plus the total cost.
    QueryDef.sql(
      "a123_voptimal_histogram",
      """WITH daily AS (
        |  SELECT CAST(day(CAST(ts AS DATE)) AS BIGINT) AS i,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT i, CAST(sum(x) OVER (ORDER BY i) AS BIGINT) AS ps,
        |    CAST(sum(x * x) OVER (ORDER BY i) AS BIGINT) AS pss
        |  FROM daily),
        |pz AS (
        |  SELECT i, ps, pss FROM p
        |  UNION ALL SELECT 0, 0, 0),
        |seg AS (
        |  -- SSE of days a+1..b (floor-quantized): ssq - s*s div m
        |  SELECT a.i AS j, b.i AS i,
        |    (b.pss - a.pss) - ((b.ps - a.ps) * (b.ps - a.ps)) // (b.i - a.i)
        |      AS sse
        |  FROM pz a JOIN pz b ON a.i < b.i),
        |e1 AS (SELECT i, sse AS e FROM seg WHERE j = 0),
        |e2 AS (
        |  SELECT s.i, min(e1.e + s.sse) AS e
        |  FROM seg s JOIN e1 ON e1.i = s.j GROUP BY s.i),
        |e3 AS (
        |  SELECT s.i, min(e2.e + s.sse) AS e
        |  FROM seg s JOIN e2 ON e2.i = s.j GROUP BY s.i),
        |nmax AS (SELECT max(i) AS n FROM daily),
        |b3 AS (
        |  SELECT s.j AS cut3, e3.e + s.sse AS e
        |  FROM seg s JOIN e3 ON e3.i = s.j JOIN nmax ON s.i = nmax.n
        |  QUALIFY row_number() OVER (ORDER BY e3.e + s.sse, s.j) = 1),
        |b2 AS (
        |  SELECT s.j AS cut2
        |  FROM seg s JOIN e2 ON e2.i = s.j JOIN b3 ON s.i = b3.cut3
        |  QUALIFY row_number() OVER (ORDER BY e2.e + s.sse, s.j) = 1),
        |b1 AS (
        |  SELECT s.j AS cut1
        |  FROM seg s JOIN e1 ON e1.i = s.j JOIN b2 ON s.i = b2.cut2
        |  QUALIFY row_number() OVER (ORDER BY e1.e + s.sse, s.j) = 1)
        |SELECT CAST(b1.cut1 AS BIGINT) AS cut1, CAST(b2.cut2 AS BIGINT) AS cut2,
        |  CAST(b3.cut3 AS BIGINT) AS cut3, CAST(b3.e AS BIGINT) AS total_sse
        |FROM b1, b2, b3""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(dayofmonth(col("ts").cast("date")).cast("long").as("i"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L)).cast("long").as("x"))
      // 30-row series → crumb DP; the flat windows are day-bounded
      val p = daily.select(col("i"),
        sum(col("x")).over(Window.orderBy(col("i"))).cast("long").as("ps"),
        sum(col("x") * col("x")).over(Window.orderBy(col("i"))).cast("long").as("pss"))
      val pz = p.unionByName(s.range(1).select(lit(0L).as("i"), lit(0L).as("ps"),
        lit(0L).as("pss"))).localCheckpoint(true)
      val a = pz.select(col("i").as("j"), col("ps").as("aps"), col("pss").as("apss"))
      val b = pz.select(col("i"), col("ps"), col("pss"))
      val seg = a.join(b, col("j") < col("i"))
        .select(col("j"), col("i"),
          ((col("pss") - col("apss")) -
            expr("((ps - aps) * (ps - aps)) div (i - j)")).as("sse"))
        .localCheckpoint(true)
      val e1 = seg.filter(col("j") === 0).select(col("i"), col("sse").as("e"))
      def level(prev: DataFrame): DataFrame =
        seg.join(prev.withColumnRenamed("i", "j2"), col("j") === col("j2"))
          .groupBy(col("i")).agg(min(col("e") + col("sse")).as("e"))
      val e2 = level(e1)
      val e3 = level(e2)
      val nmax = daily.agg(max(col("i")).as("n"))
      def argmin(prev: DataFrame, bound: DataFrame, boundCol: String,
                 outCol: String): DataFrame =
        seg.join(prev.withColumnRenamed("i", "j2"), col("j") === col("j2"))
          .join(broadcast(bound), col("i") === col(boundCol))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("e") + col("sse"), col("j"))))
          .filter(col("rn") === 1)
          .select(col("j").as(outCol), (col("e") + col("sse")).as("etot"))
      val b3 = argmin(e3, nmax, "n", "cut3")
      val b2 = argmin(e2, b3.select(col("cut3")), "cut3", "cut2")
      val b1 = argmin(e1, b2.select(col("cut2")), "cut2", "cut1")
      b1.select(col("cut1"))
        .crossJoin(broadcast(b2.select(col("cut2"))))
        .crossJoin(broadcast(b3.select(col("cut3"), col("etot"))))
        .select(col("cut1").cast("long").as("cut1"), col("cut2").cast("long").as("cut2"),
          col("cut3").cast("long").as("cut3"),
          col("etot").cast("long").as("total_sse"))
    },

    // ---- D13: sign-LSH embedding near-dup, hash-gated -----------------------
    // v3's random-hyperplane LSH is recall-bounded; axis-aligned SIGN
    // bits make the whole ANN-family pipeline DETERMINISTIC and thus
    // oracle-checked end-to-end: signature = 48 sign bits of the first
    // 48 dims, 8×6-bit band buckets generate candidates (never
    // all-pairs), Hamming ≤ 16 verifies via xor popcount — m8's banding
    // discipline applied to vectors. Signatures are one map-side fold;
    // candidates are bucket-bounded.
    QueryDef.sql(
      "d13_sign_lsh_neardup",
      """WITH s AS (
        |  SELECT vec_id,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform(range(1, 49),
        |        i -> CASE WHEN CAST(embedding[i] AS DOUBLE) >= 0
        |          THEN (CAST(1 AS BIGINT) << (i - 1)) ELSE CAST(0 AS BIGINT) END)),
        |      (a, b) -> a + b) AS sig
        |  FROM embeddings),
        |bands AS (
        |  SELECT vec_id, sig, unnest(generate_series(0, 7)) AS k FROM s),
        |cand AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
        |    a.sig AS sig_a, b.sig AS sig_b
        |  FROM bands a JOIN bands b
        |    ON a.k = b.k
        |    AND (a.sig >> CAST(a.k * 6 AS INT)) & 63
        |      = (b.sig >> CAST(b.k * 6 AS INT)) & 63
        |    AND a.vec_id < b.vec_id)
        |SELECT id_a, id_b,
        |  CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 16
        |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      val sigs = Tables.embeddings(s, d).select(col("vec_id"),
        expr("""aggregate(transform(sequence(1, 48),
            i -> IF(cast(element_at(embedding, i) as double) >= 0,
                    shiftleft(cast(1 as bigint), i - 1), cast(0 as bigint))),
          cast(0 as bigint), (a, b) -> a + b)""").as("sig"))
      val bands = sigs.select(col("vec_id"), col("sig"),
          explode(sequence(lit(0), lit(7))).as("k"))
        .withColumn("band", expr("shiftright(sig, cast(k * 6 as int)) & 63"))
      val a = bands.select(col("k"), col("band"), col("vec_id").as("id_a"),
        col("sig").as("sig_a"))
      val b = bands.select(col("k"), col("band"), col("vec_id").as("id_b"),
        col("sig").as("sig_b"))
      // verify before dedup (m8's discipline): the popcount filter
      // commutes with distinct and shrinks its shuffle
      a.join(b, Seq("k", "band")).filter(col("id_a") < col("id_b"))
        .withColumn("hamming", expr("cast(bit_count(sig_a ^ sig_b) as int)"))
        .filter(col("hamming") <= 16)
        .select(col("id_a"), col("id_b"), col("hamming")).distinct()
        .orderBy(col("id_a"), col("id_b"))
    },

    // ---- Q24: bag-semantics set operators -----------------------------------
    // INTERSECT ALL and EXCEPT ALL — the multiset operators whose
    // duplicate-counting semantics (min/differences of multiplicities)
    // differ from the DISTINCT variants this suite already exercises.
    // Operands: parts ordered by high-value lineitems vs parts ordered
    // at all; outputs keep multiplicity. Spark's intersectAll/exceptAll
    // plan as aggregated joins, not row-at-a-time.
    QueryDef.sql(
      "q24_bag_set_ops",
      """WITH hi AS (
        |  SELECT l_partkey FROM lineitem WHERE l_extendedprice > 30000),
        |lo AS (
        |  SELECT l_partkey FROM lineitem WHERE l_quantity <= 10)
        |SELECT l_partkey, 'both' AS side, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT * FROM hi INTERSECT ALL SELECT * FROM lo) GROUP BY 1
        |UNION ALL
        |SELECT l_partkey, 'hi_only', CAST(count(*) AS BIGINT)
        |FROM (SELECT * FROM hi EXCEPT ALL SELECT * FROM lo) GROUP BY 1
        |ORDER BY 2, 1""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val hi = li.filter(col("l_extendedprice") > 30000).select(col("l_partkey"))
      val lo = li.filter(col("l_quantity") <= 10).select(col("l_partkey"))
      val both = hi.intersectAll(lo).groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n")).withColumn("side", lit("both"))
      val hiOnly = hi.exceptAll(lo).groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n")).withColumn("side", lit("hi_only"))
      both.unionByName(hiOnly)
        .select(col("l_partkey"), col("side"), col("n"))
        .orderBy(col("side"), col("l_partkey"))
    }
  )
}
