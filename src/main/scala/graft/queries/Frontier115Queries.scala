package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-fifteenth frontier batch: three more SEQUENTIAL recurrences
  * made hash-gate exact by fixed-point integer arithmetic with a
  * deterministic truncating division at each step (the w15 discipline,
  * extended to recurrences that genuinely need a division inside the
  * loop): a 1-D Kalman filter, the Erlang-B blocking recursion, and
  * Goertzel single-bin tone detection over the stub audio stream.
  */
object Frontier115Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- W34: 1-D Kalman filter in fixed point ---------------------------------
    // Random-walk + observation-noise model over the daily purchase
    // series: P⁻ = P + Q; K = P⁻/(P⁻+R); x̂ += K(z − x̂); P = (1−K)P⁻,
    // with x̂ in micro-cents, P/Q/R in cents² (Q=1e10, R=1e12 baked),
    // and the gain quantized to micro-units by ONE truncating integer
    // division per step — identical in both engines, unlike any float
    // formulation (iteration amplifies 1-ulp libm divergence; see d7).
    // Per-day states come from prefix folds over the sorted day list
    // (bounded grain: T = calendar days), all inside one explode.
    QueryDef.sql(
      "w34_kalman_filter",
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS HUGEINT) AS z
        |  FROM events GROUP BY 1),
        |arr AS (
        |  SELECT list(z ORDER BY day) AS zs, list(day ORDER BY day) AS days,
        |    CAST(count(*) AS INT) AS t
        |  FROM daily),
        |states AS (
        |  SELECT unnest(list_transform(range(1, t + 1), i -> {
        |      'day': days[i], 'z': zs[i],
        |      'st': list_reduce(list_prepend([CAST(0 AS HUGEINT), 0, 0],
        |          list_transform(zs[1:i], v -> [v, v, v])),
        |        (acc, e) -> CASE WHEN acc[3] = 0
        |          THEN [e[1] * 1000000, CAST(1000000000000 AS HUGEINT),
        |                CAST(1 AS HUGEINT)]
        |          ELSE [acc[1]
        |                  + (((acc[2] + 10000000000) * 1000000
        |                      // (acc[2] + 10000000000 + 1000000000000))
        |                     * (e[1] * 1000000 - acc[1])) // 1000000,
        |                ((1000000 - (acc[2] + 10000000000) * 1000000
        |                    // (acc[2] + 10000000000 + 1000000000000))
        |                 * (acc[2] + 10000000000)) // 1000000,
        |                CAST(1 AS HUGEINT)] END)
        |    })) AS u
        |  FROM arr)
        |SELECT u.day AS day, CAST(u.z AS BIGINT) AS obs_cents,
        |  CAST(u.st[1] AS BIGINT) AS filt_cents_micro,
        |  CAST(u.st[2] AS BIGINT) AS p_var,
        |  CAST(u.z * 1000000 - u.st[1] AS BIGINT) AS resid_micro
        |FROM states ORDER BY day""".stripMargin) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "purchase",
          floor(col("value") * 100).cast("long")).otherwise(0L))
          .cast("decimal(38,0)").as("z"))
      val arr = daily.agg(
        transform(array_sort(collect_list(struct(col("day"), col("z")))),
          e => e.getField("z")).as("zs"),
        sort_array(collect_list(col("day"))).as("days"),
        count(lit(1)).cast("int").as("t"))
      val states = arr.select(explode(expr(
        """transform(sequence(1, t), i -> struct(
          |  element_at(days, i) as day,
          |  element_at(zs, i) as z,
          |  aggregate(slice(zs, 1, i),
          |    array(cast(0 as decimal(38,0)), cast(0 as decimal(38,0)),
          |          cast(0 as decimal(38,0))),
          |    (acc, v) -> IF(acc[2] = 0,
          |      array(cast(v * 1000000 as decimal(38,0)),
          |            cast(1000000000000 as decimal(38,0)),
          |            cast(1 as decimal(38,0))),
          |      array(cast(acc[0]
          |              + (((acc[1] + 10000000000) * 1000000
          |                  div (acc[1] + 10000000000 + 1000000000000))
          |                 * (v * 1000000 - acc[0])) div 1000000
          |              as decimal(38,0)),
          |            cast(((1000000 - (acc[1] + 10000000000) * 1000000
          |                  div (acc[1] + 10000000000 + 1000000000000))
          |                 * (acc[1] + 10000000000)) div 1000000
          |              as decimal(38,0)),
          |            cast(1 as decimal(38,0))))) as st))""".stripMargin))
        .as("r"))
      states.select(col("r.day").as("day"),
        col("r.z").cast("long").as("obs_cents"),
        expr("cast(r.st[0] as bigint)").as("filt_cents_micro"),
        expr("cast(r.st[1] as bigint)").as("p_var"),
        expr("cast(r.z * 1000000 - r.st[0] as bigint)").as("resid_micro"))
        .orderBy(col("day"))
    },

    // ---- W35: Erlang-B blocking table ------------------------------------------
    // Capacity planning's classic: B(k, a) = aB(k-1)/(k + aB(k-1)) per
    // nation, offered load a = orders per active day, blocking in
    // micro-units with one truncating division per server step. The
    // fold runs once per (nation, k) over sequence(1, k) — k <= 16, so
    // the whole table is arithmetic on a 25-row aggregate; the fact
    // scan happens exactly once.
    QueryDef.sql(
      "w35_erlang_blocking",
      """WITH ld AS (
        |  SELECT c.c_nationkey AS nk,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(count(DISTINCT CAST(o.o_orderdate AS DATE)) AS BIGINT) AS n_days
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1),
        |am AS (
        |  SELECT nk, n_orders, n_days,
        |    CAST(n_orders * 1000000 // n_days AS HUGEINT) AS a_micro
        |  FROM ld),
        |ks AS (SELECT unnest([1, 2, 4, 8, 16]) AS k),
        |b AS (
        |  SELECT a.nk, a.n_orders, a.n_days, a.a_micro, k.k,
        |    list_reduce(list_prepend(CAST(1000000 AS HUGEINT),
        |        list_transform(range(1, k.k + 1), i -> CAST(i AS HUGEINT))),
        |      (acc, i) -> (a.a_micro * acc * 1000000)
        |        // (1000000000000 * i + a.a_micro * acc)) AS p
        |  FROM am a CROSS JOIN ks k)
        |SELECT n.n_name AS nation, CAST(b.a_micro AS BIGINT) AS a_micro,
        |  CAST(b.k AS INT) AS servers,
        |  CAST(b.p AS BIGINT) AS block_micro,
        |  CAST((b.a_micro * (1000000 - b.p) * 1000)
        |    // (b.k * 1000000000000) AS BIGINT) AS util_permille
        |FROM b JOIN nation n ON n.n_nationkey = b.nk
        |ORDER BY nation, servers""".stripMargin) { (s, d) =>
      val ld = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).cast("long").as("n_orders"),
          countDistinct(col("o_orderdate").cast("date")).cast("long")
            .as("n_days"))
        .withColumn("a_micro",
          expr("cast(n_orders * 1000000 div n_days as decimal(38,0))"))
      val ks = s.range(0, 5).select(
        element_at(array(lit(1), lit(2), lit(4), lit(8), lit(16)),
          col("id").cast("int") + 1).as("k"))
      val b = ld.crossJoin(broadcast(ks)).withColumn("p", expr(
        """aggregate(sequence(1, k), cast(1000000 as decimal(38,0)),
          |  (acc, i) -> cast((a_micro * acc * 1000000)
          |    div (cast(1000000000000 as decimal(38,0)) * i + a_micro * acc)
          |    as decimal(38,0)))""".stripMargin))
      b.join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))),
          Seq("nk"))
        .select(col("nation"), col("a_micro").cast("long").as("a_micro"),
          col("k").cast("int").as("servers"),
          col("p").cast("long").as("block_micro"),
          expr("cast((a_micro * (1000000 - p) * 1000)" +
            " div (cast(k as decimal(38,0)) * 1000000000000) as bigint)")
            .as("util_permille"))
        .orderBy(col("nation"), col("servers"))
    },

    // ---- M14: Goertzel single-bin tone detection --------------------------------
    // The streaming-friendly alternative to an FFT when only a few
    // bins matter: s_n = x_n + c·s_{n-1} − s_{n-2} with c = 2cos(ω)
    // baked in micro-units (ω = 2π/16, 2π/8, 2π/4), run over the first
    // 64 stub-audio samples per asset; bin power = s_N² + s_{N-1}²
    // − c·s_N·s_{N-1}. One fold per (asset, bin), no shuffle until the
    // per-asset dominant-bin window (partitioned by asset — scales).
    QueryDef.sql(
      "m14_goertzel_tones",
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    list_transform(string_split_regex(substring(text, 1, 64), ''),
        |      ch -> ascii(ch)) AS codes
        |  FROM documents WHERE doc_id % 3 = 2),
        |c AS (SELECT asset_id, codes FROM a WHERE len(codes) >= 64),
        |f AS (SELECT * FROM (VALUES ('f04', CAST(0 AS HUGEINT)),
        |  ('f08', CAST(1414214 AS HUGEINT)),
        |  ('f16', CAST(1847759 AS HUGEINT))) AS t(fb, cm)),
        |g AS (
        |  SELECT a.asset_id, f.fb, f.cm,
        |    list_reduce(list_prepend([CAST(0 AS HUGEINT), 0],
        |        list_transform(a.codes[1:64], x -> [CAST(x AS HUGEINT), 0])),
        |      (acc, e) -> [e[1] * 1000000 + (f.cm * acc[1]) // 1000000 - acc[2],
        |                   acc[1]]) AS st
        |  FROM c a CROSS JOIN f),
        |p AS (
        |  SELECT asset_id, fb,
        |    CAST(((st[1] * st[1] + st[2] * st[2]) * 1000000
        |      - cm * st[1] * st[2]) // 1000000000000 AS BIGINT) AS power_micro
        |  FROM g)
        |SELECT asset_id, fb, power_micro,
        |  CAST(CASE WHEN row_number() OVER (PARTITION BY asset_id
        |      ORDER BY power_micro DESC, fb ASC) = 1
        |    THEN 1 ELSE 0 END AS INT) AS is_dominant
        |FROM p ORDER BY asset_id, fb""".stripMargin) { (s, d) =>
      val codes = transform(
        filter(split(substring(col("text"), 1, 64), ""), c => length(c) > 0),
        c => ascii(c))
      val base = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(3)) === 2)
        .select(col("doc_id").as("asset_id"), codes.as("codes"))
        .filter(size(col("codes")) >= 64)
      val freqs = s.range(0, 3).select(
        element_at(array(lit("f04"), lit("f08"), lit("f16")),
          col("id").cast("int") + 1).as("fb"),
        element_at(array(lit(0L), lit(1414214L), lit(1847759L)),
          col("id").cast("int") + 1).cast("decimal(38,0)").as("cm"))
      val g = base.crossJoin(broadcast(freqs)).withColumn("st", expr(
        """aggregate(slice(codes, 1, 64),
          |  array(cast(0 as decimal(38,0)), cast(0 as decimal(38,0))),
          |  (acc, x) -> array(
          |    cast(x * 1000000 + (cm * acc[0]) div 1000000 - acc[1]
          |      as decimal(38,0)),
          |    acc[0]))""".stripMargin))
      // The quadratic form is scaled UP by 1e6 before the single
      // truncating division: an intermediate (cm·s1·s2) div 1e6 would
      // overflow IntegralDivide's BIGINT result type (~5e20), and the
      // scaled form is nonnegative so truncation is engine-identical.
      val p = g.select(col("asset_id"), col("fb"),
        expr("cast(((st[0] * st[0] + st[1] * st[1]) * 1000000" +
          " - cm * st[0] * st[1]) div 1000000000000 as bigint)")
          .as("power_micro"))
      p.withColumn("is_dominant",
        when(row_number().over(Window.partitionBy(col("asset_id"))
          .orderBy(col("power_micro").desc, col("fb").asc)) === 1, 1)
          .otherwise(0).cast("int"))
        .orderBy(col("asset_id"), col("fb"))
    }
  )
}
