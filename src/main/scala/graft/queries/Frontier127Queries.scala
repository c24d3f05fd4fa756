package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-twenty-seventh frontier batch: audio onset detection by
  * spectral flux over Goertzel band energies (composing m5's frame grid
  * with m14's fixed-point resonator), a join-order cardinality audit
  * (actual intermediate sizes vs the independence estimates an
  * optimizer uses), and the retry-storm amplification profile of
  * fixed-backoff vs jittered retries.
  */
object Frontier127Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- M16: onset detection via spectral flux ----------------------------------
    // Frames of 32 samples at hop 16 over the stub audio stream; per
    // frame, two Goertzel band energies (2π/8, 2π/16) in fixed point;
    // spectral flux = positive band-energy change between consecutive
    // frames; an onset fires where flux exceeds 1.5× the asset's mean
    // flux (cross-multiplied — no division). The frame grid is an
    // explode, the energies are folds on the scan, the flux is one
    // per-asset lag window.
    QueryDef.sql(
      "m16_onset_detection",
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    list_transform(string_split_regex(substring(text, 1, 128), ''),
        |      ch -> CAST(ascii(ch) AS HUGEINT)) AS codes
        |  FROM documents WHERE doc_id % 3 = 2),
        |w AS (
        |  SELECT asset_id, codes,
        |    unnest(range(0, (len(codes) - 32) // 16 + 1)) AS widx
        |  FROM a WHERE len(codes) >= 32),
        |fr AS (
        |  SELECT asset_id, CAST(widx AS INT) AS widx,
        |    codes[widx * 16 + 1 : widx * 16 + 32] AS wc
        |  FROM w),
        |en0 AS (
        |  SELECT asset_id, widx, b.cm,
        |    list_reduce(list_prepend([CAST(0 AS HUGEINT), 0],
        |        list_transform(wc, x -> [x, x])),
        |      (acc, e) -> [e[1] * 1000000 + (cm * acc[1]) // 1000000 - acc[2],
        |                   acc[1]]) AS st
        |  FROM fr CROSS JOIN (SELECT unnest([CAST(1414214 AS HUGEINT),
        |    CAST(1847759 AS HUGEINT)]) AS cm) b),
        |en1 AS (
        |  SELECT asset_id, widx, cm,
        |    CAST(((st[1] * st[1] + st[2] * st[2]) * 1000000
        |      - cm * st[1] * st[2]) // 1000000000000 AS BIGINT) AS e
        |  FROM en0),
        |en AS (
        |  SELECT asset_id, widx,
        |    max(CASE WHEN cm = 1414214 THEN e END) AS e1,
        |    max(CASE WHEN cm = 1847759 THEN e END) AS e2
        |  FROM en1 GROUP BY 1, 2),
        |flux AS (
        |  SELECT asset_id, widx,
        |    greatest(e1 - lag(e1, 1, e1)
        |      OVER (PARTITION BY asset_id ORDER BY widx), 0)
        |    + greatest(e2 - lag(e2, 1, e2)
        |      OVER (PARTITION BY asset_id ORDER BY widx), 0) AS fl
        |  FROM en),
        |agg AS (
        |  SELECT asset_id, CAST(count(*) AS BIGINT) AS n_frames,
        |    CAST(sum(fl) AS BIGINT) AS total_flux
        |  FROM flux GROUP BY 1)
        |SELECT f.asset_id, a.n_frames, a.total_flux,
        |  CAST(count(*) FILTER (WHERE f.fl * 2 * a.n_frames > 3 * a.total_flux)
        |    AS BIGINT) AS n_onsets,
        |  CAST(coalesce(min(f.widx) FILTER (
        |    WHERE f.fl * 2 * a.n_frames > 3 * a.total_flux), -1) AS INT)
        |    AS first_onset
        |FROM flux f JOIN agg a ON a.asset_id = f.asset_id
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin) { (s, d) =>
      val codes = expr("transform(filter(split(substring(text, 1, 128), '')," +
        " c -> length(c) > 0), c -> cast(ascii(c) as decimal(38,0)))")
      // r5 opt: the flux window below needs hashpartitioning(asset_id)
      // anyway — move that exchange BELOW the scan so the Goertzel
      // folds (interpreted HOFs, the expensive stage) run across
      // cores instead of inside the single-row-group scan task. Same
      // exchange count; the heavy projection changes sides.
      val a = graft.operators.Spread.by(
          Tables.documents(s, d).filter(pmod(col("doc_id"), lit(3)) === 2),
          col("doc_id"))
        .select(col("doc_id").as("asset_id"), codes.as("codes"))
        .filter(size(col("codes")) >= 32)
      val fr = a
        .withColumn("widx", explode(expr(
          "sequence(0, (size(codes) - 32) div 16)")))
        .select(col("asset_id"), col("widx").cast("int").as("widx"),
          expr("slice(codes, widx * 16 + 1, 32)").as("wc"))
      def goertzel(cm: Long): String =
        s"""aggregate(wc, array(cast(0 as decimal(38,0)), cast(0 as decimal(38,0))),
           |  (acc, x) -> array(cast(x * 1000000 + ($cm * acc[0]) div 1000000
           |      - acc[1] as decimal(38,0)), acc[0]))""".stripMargin
      def energy(st: String, cm: Long): String =
        s"""cast((($st[0] * $st[0] + $st[1] * $st[1]) * 1000000
           |  - $cm * $st[0] * $st[1]) div 1000000000000 as bigint)""".stripMargin
      val en = fr
        .withColumn("st1", expr(goertzel(1414214L)))
        .withColumn("st2", expr(goertzel(1847759L)))
        .select(col("asset_id"), col("widx"),
          expr(energy("st1", 1414214L)).as("e1"),
          expr(energy("st2", 1847759L)).as("e2"))
      val wA = Window.partitionBy(col("asset_id")).orderBy(col("widx"))
      val flux = en.select(col("asset_id"), col("widx"),
        (greatest(col("e1") - lag(col("e1"), 1, null).over(wA), lit(0L))
          + greatest(col("e2") - lag(col("e2"), 1, null).over(wA), lit(0L)))
          .as("fl0"))
        .withColumn("fl", coalesce(col("fl0"), lit(0L)))
      // r5 opt: per-asset totals as unordered windows over the SAME
      // partitioning as the flux lag window — the old groupBy+self-join
      // re-evaluated the whole Goertzel chain on both join sides (two
      // scans, two Generates in the plan) and added a join exchange.
      val wAsset = Window.partitionBy(col("asset_id"))
      flux
        .withColumn("n_frames", count(lit(1)).over(wAsset).cast("long"))
        .withColumn("total_flux", sum(col("fl")).over(wAsset).cast("long"))
        .groupBy(col("asset_id"), col("n_frames"), col("total_flux"))
        .agg(count(when(col("fl") * 2 * col("n_frames")
          > lit(3) * col("total_flux"), 1)).cast("long").as("n_onsets"),
          coalesce(min(when(col("fl") * 2 * col("n_frames")
            > lit(3) * col("total_flux"), col("widx"))), lit(-1))
            .cast("int").as("first_onset"))
        .orderBy(col("asset_id"))
    },

    // ---- J22: join-order cardinality audit -----------------------------------------
    // Three orders for the filtered C⋈O⋈L star (building-segment
    // customers, 1995 orders, qty>30 lines): the ACTUAL first
    // intermediate size of each order, next to the textbook
    // independence estimate |A⋈B| ≈ |A|·|B| / max(ndv). The ratio
    // column is the estimation error the optimizer would act on — on
    // real data the per-order errors differ by orders of magnitude,
    // which is the whole case for join-order search with real stats.
    QueryDef.sql(
      "j22_join_order_audit",
      """WITH cf AS (SELECT c_custkey FROM customer
        |  WHERE c_mktsegment = 'BUILDING'),
        |of AS (SELECT o_orderkey, o_custkey FROM orders
        |  WHERE year(o_orderdate) = 1995),
        |lf AS (SELECT l_orderkey FROM lineitem WHERE l_quantity > 30),
        |sz AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM cf) AS nc,
        |    (SELECT CAST(count(*) AS BIGINT) FROM of) AS no,
        |    (SELECT CAST(count(*) AS BIGINT) FROM lf) AS nl,
        |    (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) FROM cf) AS dc,
        |    (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM of) AS doc,
        |    (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM of) AS dok,
        |    (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) FROM lf) AS dl),
        |acts AS (
        |  SELECT
        |    (SELECT CAST(count(*) AS BIGINT) FROM cf c
        |      JOIN of o ON o.o_custkey = c.c_custkey) AS a_co,
        |    (SELECT CAST(count(*) AS BIGINT) FROM of o
        |      JOIN lf l ON l.l_orderkey = o.o_orderkey) AS a_ol,
        |    (SELECT CAST(count(*) AS BIGINT) FROM cf c
        |      JOIN of o ON o.o_custkey = c.c_custkey
        |      JOIN lf l ON l.l_orderkey = o.o_orderkey) AS a_col),
        |plans0 AS (
        |  SELECT s.*, a.*,
        |    unnest([
        |      {'plan': 'co_first', 'act': a.a_co,
        |       'est': s.nc * s.no // greatest(greatest(s.dc, s.doc), 1)},
        |      {'plan': 'ol_first', 'act': a.a_ol,
        |       'est': s.no * s.nl // greatest(greatest(s.dok, s.dl), 1)},
        |      {'plan': 'final', 'act': a.a_col,
        |       'est': (s.nc * s.no // greatest(greatest(s.dc, s.doc), 1))
        |         * s.nl // greatest(greatest(s.dok, s.dl), 1)}]) AS u
        |  FROM sz s CROSS JOIN acts a)
        |SELECT u.plan AS plan, CAST(u.act AS BIGINT) AS actual_rows,
        |  CAST(u.est AS BIGINT) AS estimated_rows,
        |  CAST(u.est * 1000 // greatest(u.act, 1) AS BIGINT)
        |    AS est_over_act_permille
        |FROM plans0 ORDER BY plan""".stripMargin) { (s, d) =>
      val cf = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey")).localCheckpoint(true)
      val of = Tables.orders(s, d).filter(year(col("o_orderdate")) === 1995)
        .select(col("o_orderkey"), col("o_custkey")).localCheckpoint(true)
      val lf = Tables.lineitem(s, d).filter(col("l_quantity") > 30)
        .select(col("l_orderkey")).localCheckpoint(true)
      val sz = cf.agg(count(lit(1)).cast("long").as("nc"),
        countDistinct(col("c_custkey")).cast("long").as("dc"))
        .crossJoin(of.agg(count(lit(1)).cast("long").as("no"),
          countDistinct(col("o_custkey")).cast("long").as("doc"),
          countDistinct(col("o_orderkey")).cast("long").as("dok")))
        .crossJoin(lf.agg(count(lit(1)).cast("long").as("nl"),
          countDistinct(col("l_orderkey")).cast("long").as("dl")))
      val aCO = cf.join(of, col("o_custkey") === col("c_custkey"))
        .agg(count(lit(1)).cast("long").as("a_co"))
      val aOL = of.join(lf, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).cast("long").as("a_ol"))
      val aCOL = cf.join(of, col("o_custkey") === col("c_custkey"))
        .join(lf, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).cast("long").as("a_col"))
      sz.crossJoin(broadcast(aCO)).crossJoin(broadcast(aOL))
        .crossJoin(broadcast(aCOL))
        .select(explode(array(
          struct(lit("co_first").as("plan"), col("a_co").as("act"),
            expr("nc * no div greatest(greatest(dc, doc), 1)").as("est")),
          struct(lit("ol_first").as("plan"), col("a_ol").as("act"),
            expr("no * nl div greatest(greatest(dok, dl), 1)").as("est")),
          struct(lit("final").as("plan"), col("a_col").as("act"),
            expr("(nc * no div greatest(greatest(dc, doc), 1))" +
              " * nl div greatest(greatest(dok, dl), 1)").as("est"))))
          .as("u"))
        .select(col("u.plan").as("plan"),
          col("u.act").cast("long").as("actual_rows"),
          col("u.est").cast("long").as("estimated_rows"),
          expr("u.est * 1000 div greatest(u.act, 1)").cast("long")
            .as("est_over_act_permille"))
        .orderBy(col("plan"))
    },

    // ---- EV111: retry-storm amplification ------------------------------------------
    // Open-loop retry amplification: every error retries at +1/+2/+4/+8
    // minutes (fixed backoff) or at a hash-jittered offset in [1, 8].
    // Offered load per minute is the base stream plus four shifted
    // copies — pure unions, no state — and the audit compares peak and
    // total amplification of the two policies: the measured argument
    // for jitter. Scales as five scans of the error stream (or one scan
    // + explode, as here).
    QueryDef.sql(
      "ev111_retry_backoff",
      """WITH base AS (
        |  SELECT epoch_us(ts) // 60000000 AS m,
        |    event_id
        |  FROM events WHERE event_type = 'error'),
        |fixed AS (
        |  SELECT m + CAST(off AS BIGINT) AS m
        |  FROM base CROSS JOIN (SELECT unnest([0, 1, 2, 4, 8]) AS off) o),
        |jit AS (
        |  SELECT m AS m FROM base
        |  UNION ALL
        |  SELECT m + CAST(off AS BIGINT)
        |    + 1 + (('0x' || substr(md5('j:' || CAST(event_id AS VARCHAR)
        |      || ':' || CAST(off AS VARCHAR)), 1, 15))::BIGINT % 8) AS m
        |  FROM base CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS off) o),
        |lf AS (SELECT m, CAST(count(*) AS BIGINT) AS load FROM fixed GROUP BY 1),
        |lj AS (SELECT m, CAST(count(*) AS BIGINT) AS load FROM jit GROUP BY 1),
        |lb AS (SELECT m, CAST(count(*) AS BIGINT) AS load FROM base GROUP BY 1),
        |stats AS (
        |  SELECT 'base' AS policy, max(load) AS peak,
        |    CAST(sum(load) AS BIGINT) AS total FROM lb
        |  UNION ALL SELECT 'fixed', max(load), CAST(sum(load) AS BIGINT) FROM lf
        |  UNION ALL SELECT 'jitter', max(load), CAST(sum(load) AS BIGINT) FROM lj),
        |bp AS (SELECT max(load) AS bpeak FROM lb)
        |SELECT s.policy, CAST(s.peak AS BIGINT) AS peak_per_min, s.total,
        |  CAST(s.peak * 1000 // b.bpeak AS BIGINT) AS peak_amp_permille
        |FROM stats s CROSS JOIN bp b ORDER BY s.policy""".stripMargin) { (s, d) =>
      val base = Tables.events(s, d).filter(col("event_type") === "error")
        .select(expr("unix_micros(ts) div 60000000").as("m"), col("event_id"))
        .localCheckpoint(true) // three policies read it
      val offsFixed = s.range(0, 5).select(
        element_at(array(lit(0), lit(1), lit(2), lit(4), lit(8)),
          col("id").cast("int") + 1).as("off"))
      val fixed = base.crossJoin(broadcast(offsFixed))
        .select((col("m") + col("off").cast("long")).as("m"))
      val offsJit = s.range(0, 4).select(col("id").cast("int").as("off"))
      val jit = base.select(col("m"))
        .unionByName(base.crossJoin(broadcast(offsJit))
          .select((col("m") + col("off").cast("long") + 1
            + (conv(substring(md5(concat(lit("j:"),
              col("event_id").cast("string"), lit(":"),
              col("off").cast("string"))), 1, 15), 16, 10).cast("long") % 8))
            .as("m")))
      def loads(df: DataFrame) = df.groupBy(col("m"))
        .agg(count(lit(1)).cast("long").as("load"))
      val stats = loads(base.select(col("m"))).agg(max(col("load")).as("peak"),
          sum(col("load")).cast("long").as("total"))
        .select(lit("base").as("policy"), col("peak"), col("total"))
        .unionByName(loads(fixed).agg(max(col("load")).as("peak"),
          sum(col("load")).cast("long").as("total"))
          .select(lit("fixed").as("policy"), col("peak"), col("total")))
        .unionByName(loads(jit).agg(max(col("load")).as("peak"),
          sum(col("load")).cast("long").as("total"))
          .select(lit("jitter").as("policy"), col("peak"), col("total")))
      val bp = loads(base.select(col("m"))).agg(max(col("load")).as("bpeak"))
      stats.crossJoin(broadcast(bp))
        .select(col("policy"), col("peak").cast("long").as("peak_per_min"),
          col("total"),
          expr("peak * 1000 div bpeak").cast("long").as("peak_amp_permille"))
        .orderBy(col("policy"))
    }
  )
}
