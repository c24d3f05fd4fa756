package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-twenty-second frontier batch: optimal-string-alignment
  * distance (Damerau transpositions) as a nested DP fold — the first
  * full dynamic-programming TABLE under the hash gate — plus histogram
  * equalization on the stub pixel stream, and a copy-on-write vs
  * merge-on-read storage pricing of real update traffic.
  */
object Frontier122Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- T90: OSA (Damerau) distance as a nested DP fold ------------------------
    // levenshtein() is native in both engines, but neither has the
    // transposition-aware variant — so the full DP table runs as a
    // fold over b's characters whose accumulator carries the previous
    // TWO rows (pprev enables the d[i-2][j-2]+1 transposition case),
    // each row itself a fold that appends cells. Pairs: each sampled
    // part name against the next name in its brand (12-char prefixes);
    // the delta column shows exactly where transpositions beat plain
    // edit distance. O(12²) integer lambda steps per pair, on a few
    // hundred pairs.
    QueryDef.sql(
      "t90_osa_distance",
      """WITH RECURSIVE sampled AS (
        |  SELECT p_brand AS brand, p_partkey AS pk,
        |    lower(substr(p_name, 1, 12)) AS nm
        |  FROM part WHERE p_partkey % 37 = 1),
        |pairs AS (
        |  SELECT brand, nm AS a,
        |    lead(nm) OVER (PARTITION BY brand ORDER BY pk) AS b
        |  FROM sampled QUALIFY b IS NOT NULL),
        |prep AS (
        |  SELECT row_number() OVER (ORDER BY brand, a, b) AS pid, brand, a, b,
        |    list_transform(string_split_regex(a, ''), c -> c) AS ac,
        |    list_transform(string_split_regex(b, ''), c -> c) AS bc,
        |    CAST(len(a) AS INT) AS la, CAST(len(b) AS INT) AS lb
        |  FROM pairs),
        |-- the DP steps are a recursive CTE (each row pair materialized
        |-- per step) rather than a nested list_reduce: an outer-reduce
        |-- struct accumulator referenced inside an inner reduce comes
        |-- back ALIASED in DuckDB (pp arrives equal to the new pv),
        |-- silently enabling phantom transpositions
        |dp AS (
        |  SELECT pid, 0 AS j, range(0, la + 1) AS pp, range(0, la + 1) AS pv
        |  FROM prep
        |  UNION ALL
        |  SELECT d.pid, d.j + 1, d.pv,
        |    list_reduce(list_prepend([CAST(d.j + 1 AS BIGINT)],
        |        list_transform(range(1, p.la + 1), i -> [CAST(i AS BIGINT)])),
        |      (row, ie) -> list_append(row, least(
        |        row[len(row)] + 1,
        |        d.pv[ie[1] + 1] + 1,
        |        d.pv[ie[1]] + CASE WHEN p.ac[ie[1]] = p.bc[d.j + 1]
        |          THEN 0 ELSE 1 END,
        |        CASE WHEN ie[1] >= 2 AND d.j + 1 >= 2
        |            AND p.ac[ie[1]] = p.bc[d.j]
        |            AND p.ac[ie[1] - 1] = p.bc[d.j + 1]
        |          THEN d.pp[ie[1] - 1] + 1 ELSE 999 END)))
        |  FROM dp d JOIN prep p ON p.pid = d.pid
        |  WHERE d.j < p.lb)
        |SELECT p.brand, p.a, p.b,
        |  CAST(d.pv[p.la + 1] AS BIGINT) AS osa,
        |  CAST(levenshtein(p.a, p.b) AS BIGINT) AS lev,
        |  CAST(levenshtein(p.a, p.b) - d.pv[p.la + 1] AS BIGINT)
        |    AS transposition_gain
        |FROM dp d JOIN prep p ON p.pid = d.pid AND d.j = p.lb
        |ORDER BY p.brand, p.a, p.b""".stripMargin) { (s, d) =>
      val sampled = Tables.part(s, d)
        .filter(col("p_partkey") % 37 === 1)
        .select(col("p_brand").as("brand"), col("p_partkey").as("pk"),
          lower(substring(col("p_name"), 1, 12)).as("nm"))
      val pairs = sampled
        .withColumn("b", lead(col("nm"), 1).over(
          Window.partitionBy(col("brand")).orderBy(col("pk"))))
        .filter(col("b").isNotNull)
        .select(col("brand"), col("nm").as("a"), col("b"))
      val prep = pairs
        .withColumn("ac", expr("filter(split(a, ''), c -> length(c) > 0)"))
        .withColumn("bc", expr("filter(split(b, ''), c -> length(c) > 0)"))
        .withColumn("la", length(col("a")).cast("int"))
        .withColumn("lb", length(col("b")).cast("int"))
      // state: previous two DP rows; each new row folds left-to-right
      // because a cell needs its LEFT neighbor (so it cannot be a
      // transform). The 999 sentinel disables the transposition case.
      val dp = prep.withColumn("fin", expr(
        """aggregate(sequence(1, lb),
          |  struct(cast(sequence(0, la) as array<bigint>) as pp,
          |         cast(sequence(0, la) as array<bigint>) as pv),
          |  (st, j) -> struct(
          |    st.pv as pp,
          |    aggregate(sequence(1, la),
          |      array(cast(j as bigint)),
          |      (row, i) -> concat(row, array(least(
          |        element_at(row, size(row)) + 1,
          |        element_at(st.pv, i + 1) + 1,
          |        element_at(st.pv, i) + (CASE WHEN element_at(ac, i)
          |          = element_at(bc, j) THEN 0L ELSE 1L END),
          |        CASE WHEN i >= 2 AND j >= 2
          |            AND element_at(ac, i) = element_at(bc, j - 1)
          |            AND element_at(ac, i - 1) = element_at(bc, j)
          |          THEN element_at(st.pp, i - 1) + 1 ELSE 999L END)))) as pv))
          |""".stripMargin))
      dp.select(col("brand"), col("a"), col("b"),
        expr("element_at(fin.pv, la + 1)").cast("long").as("osa"),
        levenshtein(col("a"), col("b")).cast("long").as("lev"),
        (levenshtein(col("a"), col("b"))
          - expr("element_at(fin.pv, la + 1)")).cast("long")
          .as("transposition_gain"))
        .orderBy(col("brand"), col("a"), col("b"))
    },

    // ---- M15: histogram equalization on the stub pixel stream --------------------
    // The classic contrast stretch: remap each pixel through its
    // asset's own CDF, h(v) = (cdf(v) − cdf_min)·255 / (N − cdf_min).
    // Per-asset histograms and CDFs are partitioned windows (never
    // global); the before/after audit reports used levels, range, and
    // mean absolute deviation ×1000 (exact: Σ|N·v − S| / N²), which
    // equalization should widen.
    QueryDef.sql(
      "m15_hist_equalize",
      """WITH px0 AS (
        |  SELECT doc_id AS asset_id,
        |    unnest(list_transform(string_split_regex(substring(text, 1, 96), ''),
        |      ch -> ascii(ch))) AS v
        |  FROM documents WHERE doc_id % 3 = 1),
        |hist AS (
        |  SELECT asset_id, v, CAST(count(*) AS BIGINT) AS cnt
        |  FROM px0 GROUP BY 1, 2),
        |cdf AS (
        |  SELECT asset_id, v, cnt,
        |    sum(cnt) OVER (PARTITION BY asset_id ORDER BY v) AS cd,
        |    min(cnt) OVER (PARTITION BY asset_id) AS dummy,
        |    first_value(cnt) OVER (PARTITION BY asset_id ORDER BY v) AS cdmin,
        |    sum(cnt) OVER (PARTITION BY asset_id) AS n
        |  FROM hist),
        |mapped AS (
        |  SELECT asset_id, v, cnt,
        |    CASE WHEN n = cdmin THEN 0
        |      ELSE CAST((cd - cdmin) * 255 // (n - cdmin) AS BIGINT) END AS v2,
        |    n
        |  FROM cdf),
        |stats AS (
        |  SELECT asset_id,
        |    CAST(count(*) AS BIGINT) AS used_before,
        |    CAST(count(DISTINCT v2) AS BIGINT) AS used_after,
        |    CAST(max(v) - min(v) AS BIGINT) AS range_before,
        |    CAST(max(v2) - min(v2) AS BIGINT) AS range_after,
        |    CAST(sum(cnt * v) AS BIGINT) AS s1,
        |    CAST(sum(cnt * v2) AS BIGINT) AS s2,
        |    CAST(max(n) AS BIGINT) AS n
        |  FROM mapped GROUP BY 1),
        |mad AS (
        |  SELECT m.asset_id,
        |    CAST(sum(m.cnt * abs(CAST(s.n * m.v - s.s1 AS BIGINT))) * 1000
        |      // (s.n * s.n) AS BIGINT) AS mad_before_milli,
        |    CAST(sum(m.cnt * abs(CAST(s.n * m.v2 - s.s2 AS BIGINT))) * 1000
        |      // (s.n * s.n) AS BIGINT) AS mad_after_milli
        |  FROM mapped m JOIN stats s ON s.asset_id = m.asset_id
        |  GROUP BY 1, s.n)
        |SELECT s.asset_id, s.used_before, s.used_after,
        |  s.range_before, s.range_after,
        |  d.mad_before_milli, d.mad_after_milli
        |FROM stats s JOIN mad d ON d.asset_id = s.asset_id
        |ORDER BY s.asset_id""".stripMargin) { (s, d) =>
      val px = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(3)) === 1)
        .select(col("doc_id").as("asset_id"),
          explode(expr("transform(filter(split(substring(text, 1, 96), '')," +
            " c -> length(c) > 0), c -> ascii(c))")).as("v"))
      val hist = px.groupBy(col("asset_id"), col("v"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      val wOrd = Window.partitionBy(col("asset_id")).orderBy(col("v"))
      val wAll = Window.partitionBy(col("asset_id"))
      val cdf = hist
        .withColumn("cd", sum(col("cnt")).over(wOrd))
        .withColumn("cdmin", first(col("cnt")).over(wOrd))
        .withColumn("n", sum(col("cnt")).over(wAll))
      val mapped = cdf.withColumn("v2",
        when(col("n") === col("cdmin"), 0L)
          .otherwise(expr("(cd - cdmin) * 255 div (n - cdmin)"))
          .cast("long"))
        .localCheckpoint(true) // stats + MAD passes share it
      val stats = mapped.groupBy(col("asset_id"))
        .agg(count(lit(1)).cast("long").as("used_before"),
          countDistinct(col("v2")).cast("long").as("used_after"),
          (max(col("v")) - min(col("v"))).cast("long").as("range_before"),
          (max(col("v2")) - min(col("v2"))).cast("long").as("range_after"),
          sum(col("cnt") * col("v")).cast("long").as("s1"),
          sum(col("cnt") * col("v2")).cast("long").as("s2"),
          max(col("n")).cast("long").as("n"))
      val mad = mapped.join(stats.select(col("asset_id"), col("s1"),
          col("s2"), col("n").as("nn")), Seq("asset_id"))
        .groupBy(col("asset_id"), col("nn"))
        .agg(
          expr("cast(sum(cnt * abs(nn * v - s1)) * 1000 div (nn * nn)" +
            " as bigint)").as("mad_before_milli"),
          expr("cast(sum(cnt * abs(nn * v2 - s2)) * 1000 div (nn * nn)" +
            " as bigint)").as("mad_after_milli"))
      stats.join(mad.drop("nn"), Seq("asset_id"))
        .select(col("asset_id"), col("used_before"), col("used_after"),
          col("range_before"), col("range_after"),
          col("mad_before_milli"), col("mad_after_milli"))
        .orderBy(col("asset_id"))
    },

    // ---- U93: copy-on-write vs merge-on-read pricing ------------------------------
    // Real update traffic: each lineitem shipment "updates" its order's
    // month partition. CoW rewrites every touched month file that day;
    // MoR appends 96-byte deltas and compacts touched months weekly.
    // Priced per ship-month from measured partition sizes — the output
    // is the actual crossover table behind a table-format choice. One
    // fact join; everything else is grouped aggregation of tiny keys.
    QueryDef.sql(
      "u93_cow_vs_mor",
      """WITH omonth AS (
        |  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS om,
        |    CAST(count(*) * 40 AS BIGINT) AS fbytes
        |  FROM orders GROUP BY 1),
        |touch AS (
        |  SELECT CAST(l.l_shipdate AS DATE) AS day,
        |    strftime(CAST(o.o_orderdate AS DATE), '%Y-%m') AS om,
        |    CAST(count(*) AS BIGINT) AS upd
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1, 2),
        |cow AS (
        |  SELECT strftime(t.day, '%Y-%m') AS sm,
        |    CAST(sum(f.fbytes) AS BIGINT) AS cow_bytes,
        |    CAST(sum(t.upd) AS BIGINT) AS upd_rows
        |  FROM touch t JOIN omonth f ON f.om = t.om
        |  GROUP BY 1),
        |wk AS (
        |  SELECT DISTINCT CAST(date_trunc('week', day) AS DATE) AS wstart, om
        |  FROM touch),
        |compact AS (
        |  SELECT strftime(w.wstart, '%Y-%m') AS sm,
        |    CAST(sum(f.fbytes) AS BIGINT) AS compact_bytes
        |  FROM wk w JOIN omonth f ON f.om = w.om
        |  GROUP BY 1)
        |SELECT c.sm AS ship_month, c.upd_rows,
        |  c.cow_bytes,
        |  CAST(c.upd_rows * 96 AS BIGINT) AS mor_delta_bytes,
        |  coalesce(k.compact_bytes, 0) AS mor_compact_bytes,
        |  CAST(c.upd_rows * 96 + coalesce(k.compact_bytes, 0) AS BIGINT)
        |    AS mor_total_bytes,
        |  CAST(CASE WHEN c.cow_bytes
        |      <= c.upd_rows * 96 + coalesce(k.compact_bytes, 0)
        |    THEN 1 ELSE 0 END AS INT) AS cow_wins
        |FROM cow c LEFT JOIN compact k ON k.sm = c.sm
        |ORDER BY ship_month""".stripMargin) { (s, d) =>
      val omonth = Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("om"))
        .agg((count(lit(1)) * 40).cast("long").as("fbytes"))
      val touch = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_shipdate").cast("date").as("day"),
          date_format(col("o_orderdate"), "yyyy-MM").as("om"))
        .agg(count(lit(1)).cast("long").as("upd"))
        .localCheckpoint(true) // daily CoW and weekly compaction share it
      val cow = touch.join(broadcast(omonth), Seq("om"))
        .groupBy(date_format(col("day"), "yyyy-MM").as("sm"))
        .agg(sum(col("fbytes")).cast("long").as("cow_bytes"),
          sum(col("upd")).cast("long").as("upd_rows"))
      val wk = touch.select(trunc(col("day"), "week").as("wstart"), col("om"))
        .distinct()
      val compact = wk.join(broadcast(omonth), Seq("om"))
        .groupBy(date_format(col("wstart"), "yyyy-MM").as("sm"))
        .agg(sum(col("fbytes")).cast("long").as("compact_bytes"))
      cow.join(compact, Seq("sm"), "left")
        .select(col("sm").as("ship_month"), col("upd_rows"), col("cow_bytes"),
          (col("upd_rows") * 96).cast("long").as("mor_delta_bytes"),
          coalesce(col("compact_bytes"), lit(0L)).as("mor_compact_bytes"),
          (col("upd_rows") * 96 + coalesce(col("compact_bytes"), lit(0L)))
            .cast("long").as("mor_total_bytes"),
          when(col("cow_bytes") <= col("upd_rows") * 96
            + coalesce(col("compact_bytes"), lit(0L)), 1).otherwise(0)
            .cast("int").as("cow_wins"))
        .orderBy(col("ship_month"))
    }
  )
}
