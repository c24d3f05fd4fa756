package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.streaming.StreamStage

/** Hundred-twenty-fourth frontier batch: the Burrows-Wheeler →
  * move-to-front → run-length compression pipeline measured on real
  * text (BWT via rotation sort, MTF as a FLAT single-list fold — DuckDB
  * drops struct-accumulator fields across list_reduce steps, so the
  * alphabet and the output ranks share one array), a
  * curse-of-dimensionality distance-contrast audit over the embedding
  * corpus, and streaming SCD2 temporal enrichment (a non-equi
  * stream-static join picking the dimension version valid AT event
  * time).
  */
object Frontier124Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- T91: BWT + MTF + RLE compressibility pipeline ---------------------------
    // bzip2's front half on 48-char document prefixes: all 48 rotations
    // sort per document (a partitioned window, never global), the last
    // column is the BWT, and move-to-front recency-ranks it. The MTF
    // state is ONE flat BIGINT list — alphabet codes in the first A
    // slots, emitted ranks appended after — because a struct
    // accumulator loses fields across DuckDB list_reduce steps
    // (observed: out=[last] instead of the full history). Output: run
    // counts before/after BWT and the MTF zero-share — the measurable
    // reason BWT helps RLE.
    QueryDef.sql(
      "t91_bwt_mtf_rle",
      """WITH docs AS (
        |  SELECT doc_id, lower(substring(text, 1, 48)) AS s
        |  FROM documents WHERE doc_id % 11 = 3 AND length(text) >= 48),
        |rot0 AS (
        |  SELECT doc_id, s, unnest(range(0, 48)) AS i FROM docs),
        |rot AS (
        |  SELECT doc_id, s, i,
        |    substring(s, CAST(i + 1 AS INT)) || substring(s, 1, CAST(i AS INT))
        |      AS r,
        |    ascii(substring(s, CAST(CASE WHEN i = 0 THEN 48 ELSE i END AS INT),
        |      1)) AS code
        |  FROM rot0),
        |ranked AS (
        |  SELECT doc_id, s, code,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY r, i) AS rk
        |  FROM rot),
        |bw AS (
        |  SELECT doc_id, max(s) AS s,
        |    list(CAST(code AS BIGINT) ORDER BY rk) AS bwt
        |  FROM ranked GROUP BY 1),
        |prep AS (
        |  SELECT doc_id, bwt,
        |    list_transform(string_split_regex(s, ''),
        |      ch -> CAST(ascii(ch) AS BIGINT)) AS raw,
        |    list_sort(list_distinct(list_transform(string_split_regex(s, ''),
        |      ch -> CAST(ascii(ch) AS BIGINT)))) AS alpha
        |  FROM bw),
        |mtf AS (
        |  SELECT doc_id, raw, bwt, len(alpha) AS asz,
        |    list_reduce(list_prepend(alpha, list_transform(bwt, c -> [c])),
        |      (st, e) -> list_concat(
        |        list_concat([e[1]],
        |          list_filter(st[1:len(alpha)], x -> x <> e[1])),
        |        list_append(st[len(alpha) + 1:],
        |          list_position(st[1:len(alpha)], e[1]) - 1))) AS fin
        |  FROM prep),
        |runs AS (
        |  SELECT doc_id, asz,
        |    CAST(1 + len(list_filter(range(2, 49),
        |      i -> raw[i] <> raw[i - 1])) AS BIGINT) AS raw_runs,
        |    CAST(1 + len(list_filter(range(2, 49),
        |      i -> bwt[i] <> bwt[i - 1])) AS BIGINT) AS bwt_runs,
        |    fin[asz + 1:] AS ranks
        |  FROM mtf)
        |SELECT doc_id, CAST(asz AS BIGINT) AS alpha_size, raw_runs, bwt_runs,
        |  CAST(len(list_filter(ranks, x -> x = 0)) AS BIGINT) AS mtf_zeros,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), ranks),
        |    (a, b) -> a + b) AS BIGINT) AS mtf_rank_sum
        |FROM runs ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(11)) === 3 && length(col("text")) >= 48)
        .select(col("doc_id"), lower(substring(col("text"), 1, 48)).as("s"))
      val rot = docs
        .withColumn("i", explode(sequence(lit(0), lit(47))))
        .withColumn("r", concat(
          expr("substring(s, cast(i + 1 as int))"),
          expr("substring(s, 1, cast(i as int))")))
        .withColumn("code", expr(
          "cast(ascii(substring(s, cast(if(i = 0, 48, i) as int), 1)) as bigint)"))
      val ranked = rot.withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("r"), col("i"))))
      val bw = ranked.groupBy(col("doc_id"))
        .agg(max(col("s")).as("s"),
          transform(array_sort(collect_list(struct(col("rk"), col("code")))),
            e => e.getField("code")).as("bwt"))
      val prep = bw
        .withColumn("raw", expr(
          "transform(filter(split(s, ''), c -> length(c) > 0)," +
            " c -> cast(ascii(c) as bigint))"))
        .withColumn("alpha", expr("array_sort(array_distinct(" +
          "transform(filter(split(s, ''), c -> length(c) > 0)," +
          " c -> cast(ascii(c) as bigint))))"))
        .withColumn("asz", size(col("alpha")))
      val mtf = prep.withColumn("fin", expr(
        """aggregate(bwt, alpha,
          |  (st, c) -> concat(
          |    concat(array(c), filter(slice(st, 1, asz), x -> x <> c)),
          |    concat(slice(st, asz + 1, size(st)),
          |      array(array_position(slice(st, 1, asz), c) - 1))))""".stripMargin))
      val runs = mtf.select(col("doc_id"), col("asz"),
        expr("""cast(1 + size(filter(sequence(2, 48),
          |  i -> element_at(raw, i) <> element_at(raw, i - 1))) as bigint)
          |""".stripMargin).as("raw_runs"),
        expr("""cast(1 + size(filter(sequence(2, 48),
          |  i -> element_at(bwt, i) <> element_at(bwt, i - 1))) as bigint)
          |""".stripMargin).as("bwt_runs"),
        expr("slice(fin, asz + 1, size(fin))").as("ranks"))
      runs.select(col("doc_id"), col("asz").cast("long").as("alpha_size"),
        col("raw_runs"), col("bwt_runs"),
        expr("cast(size(filter(ranks, x -> x = 0)) as bigint)").as("mtf_zeros"),
        expr("cast(aggregate(ranks, 0L, (a, b) -> a + b) as bigint)")
          .as("mtf_rank_sum"))
        .orderBy(col("doc_id"))
    },

    // ---- V58: curse-of-dimensionality contrast audit ------------------------------
    // Distance concentration measured on the real embedding corpus:
    // per query point, contrast = (dmax − dmin)/dmin of exact quantized
    // L2² distances, at dimension prefixes 8 / 32 / 64. As dimensions
    // grow the contrast collapses — the measured fact that motivates
    // IVF/LSH pruning over brute-force thresholds. One broadcast of the
    // sampled queries; squared distances are integer zip_with folds on
    // the scan.
    QueryDef.sql(
      "v58_dim_contrast",
      """WITH q AS (
        |  SELECT vec_id AS qid,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
        |  FROM embeddings WHERE vec_id % 97 = 1 AND vec_id < 9700),
        |c AS (
        |  SELECT vec_id AS cid,
        |    list_transform(embedding,
        |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS cv
        |  FROM embeddings),
        |dz AS (
        |  SELECT q.qid, c.cid,
        |    list_transform(range(1, len(q.qv) + 1),
        |      i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])) AS dd
        |  FROM q CROSS JOIN c WHERE c.cid <> q.qid),
        |sums AS (
        |  SELECT qid, cid,
        |    list_reduce(dd[1:8], (a, b) -> a + b) AS d8,
        |    list_reduce(dd[1:32], (a, b) -> a + b) AS d32,
        |    list_reduce(dd, (a, b) -> a + b) AS d64
        |  FROM dz),
        |mm AS (
        |  SELECT qid, min(d8) AS mn8, max(d8) AS mx8,
        |    min(d32) AS mn32, max(d32) AS mx32,
        |    min(d64) AS mn64, max(d64) AS mx64
        |  FROM sums GROUP BY qid),
        |per_q0 AS (
        |  SELECT qid, unnest([{'dim': 8, 'mn': mn8, 'mx': mx8},
        |    {'dim': 32, 'mn': mn32, 'mx': mx32},
        |    {'dim': 64, 'mn': mn64, 'mx': mx64}]) AS u
        |  FROM mm),
        |per_q AS (SELECT qid, u.dim AS dim, u.mn AS mn, u.mx AS mx FROM per_q0),
        |contr AS (
        |  SELECT qid, dim,
        |    CAST((mx - mn) * 1000 // greatest(mn, 1) AS BIGINT) AS contrast_milli
        |  FROM per_q)
        |SELECT CAST(dim AS INT) AS dim,
        |  CAST(count(*) AS BIGINT) AS n_queries,
        |  CAST(sum(contrast_milli) // count(*) AS BIGINT) AS mean_contrast_milli,
        |  CAST(min(contrast_milli) AS BIGINT) AS min_contrast_milli,
        |  CAST(max(contrast_milli) AS BIGINT) AS max_contrast_milli
        |FROM contr GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      def quant(c: org.apache.spark.sql.Column) = expr(
        "transform(embedding, x -> cast(floor(cast(x as double) * 1000000)" +
          " as bigint))")
      val emb = Tables.embeddings(s, d)
      // the key cap bounds the query set to ≤100 rows at ANY corpus
      // size (dense key, no rows dropped at test scales) — without it
      // the 1/97 sample scales with the corpus and the broadcast
      // cross-join is quadratic at 100 TB (the PlanSweep bnlj rule)
      val q = emb.filter(col("vec_id") % 97 === 1 && col("vec_id") < 9700)
        .select(col("vec_id").as("qid"), quant(col("embedding")).as("qv"))
      val c = emb.select(col("vec_id").as("cid"), quant(col("embedding")).as("cv"))
      val dz = broadcast(q).crossJoin(c).filter(col("cid") =!= col("qid"))
        .withColumn("dd", expr(
          "zip_with(qv, cv, (x, y) -> (x - y) * (x - y))"))
      val sums = dz.select(col("qid"), col("cid"),
        expr("aggregate(slice(dd, 1, 8), 0L, (a, b) -> a + b)").as("d8"),
        expr("aggregate(slice(dd, 1, 32), 0L, (a, b) -> a + b)").as("d32"),
        expr("aggregate(dd, 0L, (a, b) -> a + b)").as("d64"))
      val perQ = sums.groupBy(col("qid"))
        .agg(min(col("d8")).as("mn8"), max(col("d8")).as("mx8"),
          min(col("d32")).as("mn32"), max(col("d32")).as("mx32"),
          min(col("d64")).as("mn64"), max(col("d64")).as("mx64"))
        .select(col("qid"), explode(array(
          struct(lit(8).as("dim"), col("mn8").as("mn"), col("mx8").as("mx")),
          struct(lit(32).as("dim"), col("mn32").as("mn"), col("mx32").as("mx")),
          struct(lit(64).as("dim"), col("mn64").as("mn"), col("mx64").as("mx"))))
          .as("u"))
      val contr = perQ.select(col("qid"), col("u.dim").as("dim"),
        expr("cast((u.mx - u.mn) * 1000 div greatest(u.mn, 1) as bigint)")
          .as("contrast_milli"))
      contr.groupBy(col("dim").cast("int").as("dim"))
        .agg(count(lit(1)).cast("long").as("n_queries"),
          expr("cast(sum(contrast_milli) div count(*) as bigint)")
            .as("mean_contrast_milli"),
          min(col("contrast_milli")).cast("long").as("min_contrast_milli"),
          max(col("contrast_milli")).cast("long").as("max_contrast_milli"))
        .orderBy(col("dim"))
    },

    // ---- EV109S: streaming SCD2 temporal enrichment --------------------------------
    // Event-time-correct enrichment: each streamed purchase joins the
    // rate-card version VALID AT ITS EVENT TIME (previous month's mean
    // value per event type) via a non-equi stream-static join — the
    // stateless streaming pattern for slowly-changing dimensions, no
    // watermark, no state store. The registered result aggregates the
    // streamed join output per (type, month); the oracle is the
    // identical batch SQL.
    QueryDef.sql(
      "ev109s_stream_scd2_enrich",
      """WITH mon AS (
        |  SELECT event_type, date_trunc('week', ts) AS m,
        |    CAST(sum(CAST(floor(value * 1000) AS BIGINT)) // count(*) AS BIGINT)
        |      AS rate_milli
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |dim AS (
        |  SELECT event_type, m AS valid_from,
        |    lead(m) OVER (PARTITION BY event_type ORDER BY m) AS valid_to,
        |    rate_milli
        |  FROM (SELECT event_type, m,
        |      lag(rate_milli) OVER (PARTITION BY event_type ORDER BY m)
        |        AS rate_milli
        |    FROM mon) WHERE rate_milli IS NOT NULL),
        |joined AS (
        |  SELECT e.event_type, date_trunc('week', e.ts) AS m,
        |    CAST(floor(e.value * 1000) AS BIGINT) AS v_milli, d.rate_milli
        |  FROM events e JOIN dim d ON d.event_type = e.event_type
        |    AND e.ts >= d.valid_from
        |    AND (d.valid_to IS NULL OR e.ts < d.valid_to)
        |  WHERE e.event_type = 'purchase')
        |SELECT event_type, CAST(m AS DATE) AS week,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(max(rate_milli) AS BIGINT) AS rate_milli,
        |  CAST(count(*) FILTER (WHERE v_milli > rate_milli) AS BIGINT)
        |    AS n_above_rate
        |FROM joined GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
      val mon = ev.filter(col("event_type") === "purchase")
        .groupBy(col("event_type"), date_trunc("week", col("ts")).as("m"))
        .agg(expr("cast(sum(cast(floor(value * 1000) as bigint))" +
          " div count(*) as bigint)").as("rate_milli"))
      val wT = Window.partitionBy(col("event_type")).orderBy(col("m"))
      val dim = mon
        .withColumn("rate_prev", lag(col("rate_milli"), 1).over(wT))
        .filter(col("rate_prev").isNotNull)
        .withColumn("valid_to", lead(col("m"), 1).over(wT))
        .select(col("event_type"), col("m").as("valid_from"),
          col("valid_to"), col("rate_prev").as("rate_milli"))
        .localCheckpoint(true) // static side of the stream join
      val bulk = ev.filter(pmod(col("event_id"), lit(2)) === 0)
      val rest = ev.filter(pmod(col("event_id"), lit(2)) === 1)
      val src = new java.io.File(d, "events.parquet")
      val key = s"scd2:$d:${src.lastModified}:${src.length}"
      val enriched = StreamStage.run(s, "ev109s_out",
        s"${graft.streaming.StreamStage.stageRoot}/scd2_${new java.io.File(d).getName}",
        bulk, Seq(rest), shufflePartitions = Some(graft.streaming.StreamStage.benchParts), reuseKey = Some(key)) {
        stream =>
          stream.filter(col("event_type") === "purchase").as("e")
            .join(broadcast(dim).as("dd"),
              col("e.event_type") === col("dd.event_type")
                && col("e.ts") >= col("dd.valid_from")
                && (col("dd.valid_to").isNull
                  || col("e.ts") < col("dd.valid_to")))
            .select(col("e.event_type").as("event_type"), col("e.ts").as("ts"),
              floor(col("e.value") * 1000).cast("long").as("v_milli"),
              col("dd.rate_milli").as("rate_milli"))
      }
      enriched.groupBy(col("event_type"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .agg(count(lit(1)).cast("long").as("n_events"),
          max(col("rate_milli")).cast("long").as("rate_milli"),
          count(when(col("v_milli") > col("rate_milli"), 1)).cast("long")
            .as("n_above_rate"))
        .orderBy(col("event_type"), col("week"))
    }
  )
}
