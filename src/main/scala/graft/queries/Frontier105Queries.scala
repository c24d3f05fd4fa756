package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions

/** Hundred-fifth frontier batch: LRU miss-ratio curve from exact reuse
  * distances, exact 1-D Wasserstein distance per nation, and
  * Good-Turing frequency smoothing.
  */
object Frontier105Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- EV98: LRU miss-ratio curve --------------------------------------------
    // The Mattson stack-distance method: an access hits an LRU cache of
    // size C iff the number of DISTINCT items touched since the same
    // user's previous access to that item is < C (the item sits at
    // stack depth distinct+1). One exact reuse-distance computation
    // yields the ENTIRE miss-ratio curve — hits at every candidate
    // cache size read off the same histogram, no per-size simulation.
    // The in-between scan is grid-cell blocked (the j9 interval trick):
    // each reuse interval explodes into pos/32 cells and joins events
    // on (user, cell), so the fan-out is bounded by the reuse gap,
    // which is itself bounded by the item-catalog size — not by corpus
    // length. Cold (first-touch) accesses are charged as misses at
    // every size.
    QueryDef.sql(
      "ev98_lru_mrc",
      """WITH acc AS (
        |  SELECT user_id, CAST(json_extract(props, '$.k') AS INT) AS k,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS pos
        |  FROM events),
        |rep AS (
        |  SELECT user_id, k, pos,
        |    lag(pos) OVER (PARTITION BY user_id, k ORDER BY pos) AS prev
        |  FROM acc),
        |dist AS (
        |  SELECT r.user_id, r.pos,
        |    (SELECT count(DISTINCT a.k) FROM acc a
        |     WHERE a.user_id = r.user_id AND a.pos > r.prev AND a.pos < r.pos)
        |      + 1 AS d
        |  FROM rep r WHERE r.prev IS NOT NULL),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM acc),
        |sizes AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64]) AS cache_size)
        |SELECT CAST(s.cache_size AS INT) AS cache_size,
        |  CAST(coalesce(sum(CASE WHEN d.d <= s.cache_size THEN 1 END), 0)
        |    AS BIGINT) AS hits,
        |  CAST(min(t.n) AS BIGINT) AS accesses,
        |  CAST(coalesce(sum(CASE WHEN d.d <= s.cache_size THEN 1 END), 0)
        |    * 1000 // min(t.n) AS BIGINT) AS hit_permille
        |FROM sizes s CROSS JOIN tot t LEFT JOIN dist d ON true
        |GROUP BY s.cache_size
        |ORDER BY cache_size""".stripMargin) { (s, d) =>
      val acc = Tables.events(s, d)
        .select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          row_number().over(Window.partitionBy(col("user_id"))
            .orderBy(col("ts"), col("event_id"))).as("pos"))
        .localCheckpoint(true) // reused as interval source AND probe side
      val rep = acc
        .withColumn("prev", lag(col("pos"), 1).over(
          Window.partitionBy(col("user_id"), col("k")).orderBy(col("pos"))))
        .filter(col("prev").isNotNull)
        .select(col("user_id"), col("pos"), col("prev"))
      // Grid-cell blocking: a reuse interval (prev, pos) spans cells
      // prev/32 .. pos/32; an event joins exactly one cell, so no pair
      // is produced or counted twice.
      val cells = rep.withColumn("cell",
        explode(sequence(expr("prev div 32"), expr("pos div 32"))))
      val probe = acc.select(col("user_id").as("pu"),
        col("pos").as("p2"), col("k").as("k2"),
        expr("pos div 32").as("cell"))
      val dist = cells
        .join(probe,
          col("pu") === col("user_id") && probe("cell") === cells("cell") &&
            col("p2") > col("prev") && col("p2") < col("pos"), "left")
        .groupBy(col("user_id"), col("pos"))
        .agg((countDistinct(col("k2")) + 1).as("d"))
      val tot = acc.agg(count(lit(1)).cast("long").as("n"))
      val sizes = s.range(0, 7).select(
        expr("shiftleft(1, cast(id as int))").cast("int").as("cache_size"))
      sizes.crossJoin(broadcast(tot))
        .join(dist.select(col("d")), lit(true), "left")
        .groupBy(col("cache_size"))
        .agg(
          coalesce(sum(when(col("d") <= col("cache_size"), 1L)), lit(0L))
            .cast("long").as("hits"),
          min(col("n")).cast("long").as("accesses"))
        .select(col("cache_size"), col("hits"), col("accesses"),
          expr("hits * 1000 div accesses").cast("long").as("hit_permille"))
        .orderBy(col("cache_size"))
    },

    // ---- A169: exact 1-D Wasserstein distance ----------------------------------
    // Earth mover's distance between each nation's order-price
    // distribution and the global one, computed EXACTLY as the area
    // between the two empirical CDFs: sum over support gaps of
    // |F_n - F_g| * width, with both CDFs kept as integer counts on the
    // common denominator N_n * N_g (no floats until one final integral
    // division into micro-cents). The (nation x global-support) grid is
    // the ev26 calendar-fan-out shape: each nation's cumulative runs in
    // its own window partition, so there is no unpartitioned window
    // even though every nation needs the full support.
    QueryDef.sql(
      "a169_wasserstein_1d",
      """WITH v AS (
        |  SELECT c.c_nationkey AS nk,
        |    CAST(floor(o.o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |g AS (SELECT cents, CAST(count(*) AS BIGINT) AS gcnt
        |      FROM v GROUP BY 1),
        |nc AS (SELECT nk, cents, CAST(count(*) AS BIGINT) AS ncnt
        |       FROM v GROUP BY 1, 2),
        |nat AS (SELECT DISTINCT nk FROM v),
        |grid AS (
        |  SELECT n.nk, g.cents, g.gcnt, coalesce(nc.ncnt, 0) AS ncnt
        |  FROM nat n CROSS JOIN g
        |  LEFT JOIN nc ON nc.nk = n.nk AND nc.cents = g.cents),
        |cum AS (
        |  SELECT nk, cents,
        |    sum(ncnt) OVER (PARTITION BY nk ORDER BY cents) AS cn,
        |    sum(gcnt) OVER (PARTITION BY nk ORDER BY cents) AS cg,
        |    lead(cents) OVER (PARTITION BY nk ORDER BY cents) - cents
        |      AS width
        |  FROM grid),
        |tot AS (
        |  SELECT nk, max(cn) AS nn, max(cg) AS ng FROM cum GROUP BY 1),
        |w AS (
        |  SELECT c.nk,
        |    sum(abs(c.cn * t.ng - c.cg * t.nn) * c.width) AS area,
        |    min(t.nn) AS nn, min(t.ng) AS ng
        |  FROM cum c JOIN tot t ON t.nk = c.nk
        |  WHERE c.width IS NOT NULL
        |  GROUP BY 1)
        |SELECT n.n_name,
        |  CAST(w.nn AS BIGINT) AS n_orders,
        |  CAST(w.area * 1000000 // (w.nn * w.ng) AS BIGINT) AS w1_micro_cents
        |FROM w JOIN nation n ON n.n_nationkey = w.nk
        |ORDER BY n_name""".stripMargin) { (s, d) =>
      val v = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").as("nk"),
          floor(col("o_totalprice") * 100).cast("long").as("cents"))
      val g = v.groupBy(col("cents")).agg(count(lit(1)).cast("long").as("gcnt"))
      val nc = v.groupBy(col("nk"), col("cents"))
        .agg(count(lit(1)).cast("long").as("ncnt"))
      val nat = v.select(col("nk")).distinct()
      val grid = g.crossJoin(broadcast(nat))
        .join(nc, Seq("nk", "cents"), "left")
        .select(col("nk"), col("cents"), col("gcnt"),
          coalesce(col("ncnt"), lit(0L)).as("ncnt"))
      val wn = Window.partitionBy(col("nk")).orderBy(col("cents"))
      val cum = grid.select(col("nk"), col("cents"),
        sum(col("ncnt")).over(wn).as("cn"),
        sum(col("gcnt")).over(wn).as("cg"),
        (lead(col("cents"), 1).over(wn) - col("cents")).as("width"))
      val tot = cum.groupBy(col("nk"))
        .agg(max(col("cn")).as("nn"), max(col("cg")).as("ng"))
      val w = cum.filter(col("width").isNotNull)
        .join(broadcast(tot), Seq("nk"))
        .groupBy(col("nk"))
        .agg(
          sum(abs(col("cn") * col("ng") - col("cg") * col("nn"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0)) * col("width"))
            .as("area"),
          min(col("nn")).as("nn"), min(col("ng")).as("ng"))
      w.join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("nk"))
        .select(col("n_name"),
          col("nn").cast("long").as("n_orders"),
          expr("(area * 1000000) div (nn * ng)").cast("long")
            .as("w1_micro_cents"))
        .orderBy(col("n_name"))
    },

    // ---- T83: Good-Turing frequency smoothing ----------------------------------
    // The count-of-counts table over the document vocabulary and the
    // Good-Turing adjusted counts r* = (r+1) * N_{r+1} / N_r, kept as
    // exact integer micro-units (one integral division per frequency
    // class — no floats). The heavy work is two hash aggregations
    // (term -> freq, freq -> class size); the window that looks up
    // N_{r+1} runs over the count-of-counts table, whose size is
    // bounded by the maximum term frequency, not the corpus.
    QueryDef.sql(
      "t83_good_turing",
      """WITH tok AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents),
        |tf AS (SELECT term, CAST(count(*) AS BIGINT) AS r FROM tok GROUP BY 1),
        |coc AS (SELECT r, CAST(count(*) AS BIGINT) AS n_r FROM tf GROUP BY 1),
        |ext AS (
        |  SELECT r, n_r,
        |    CASE WHEN lead(r) OVER (ORDER BY r) = r + 1
        |      THEN lead(n_r) OVER (ORDER BY r) ELSE 0 END AS n_r1
        |  FROM coc)
        |SELECT CAST(r AS BIGINT) AS r, n_r,
        |  CAST(n_r1 AS BIGINT) AS n_next,
        |  CAST((r + 1) * n_r1 * 1000000 // n_r AS BIGINT) AS r_star_micro
        |FROM ext
        |ORDER BY r""".stripMargin) { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
      val tf = tok.groupBy(col("term")).agg(count(lit(1)).cast("long").as("r"))
      val coc = tf.groupBy(col("r")).agg(count(lit(1)).cast("long").as("n_r"))
      // Count-of-counts is bounded by max term frequency (hundreds of
      // rows) — the unpartitioned window is over an aggregate, not data.
      val wr = Window.orderBy(col("r"))
      val ext = coc.select(col("r"), col("n_r"),
        when(lead(col("r"), 1).over(wr) === col("r") + 1,
          lead(col("n_r"), 1).over(wr)).otherwise(lit(0L)).as("n_r1"))
      ext
        .select(col("r").cast("long").as("r"), col("n_r"),
          col("n_r1").cast("long").as("n_next"),
          expr("(r + 1) * n_r1 * 1000000 div n_r").cast("long")
            .as("r_star_micro"))
        .orderBy(col("r"))
    }
  )
}
