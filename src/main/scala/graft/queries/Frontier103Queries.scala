package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Hundred-third frontier batch: l-diversity audit completing the
  * privacy triad, canary watermark planting/detection, and a varint
  * delta-encoding size planner across physical orderings.
  */
object Frontier103Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- C54: l-diversity audit -----------------------------------------------
    // k-anonymity (c34) bounds group SIZE; t-closeness (a110) bounds
    // distribution DISTANCE; l-diversity sits between them — every
    // quasi-identifier group must contain at least l distinct values
    // of the sensitive attribute, or a member's attribute is exposed
    // by group membership alone (the homogeneity attack). QI =
    // (lang, length-centile bucket), sensitive = source. The histogram
    // shows how many groups (and docs) sit at each diversity level;
    // the cumulative exposure column is the fraction of the corpus an
    // l >= 3 policy would have to suppress or generalize.
    QueryDef.sql(
      "c54_l_diversity",
      """WITH q AS (
        |  SELECT lang, n_chars // 100 AS len_bucket, source
        |  FROM documents),
        |grp AS (
        |  SELECT lang, len_bucket,
        |    CAST(count(DISTINCT source) AS BIGINT) AS l,
        |    CAST(count(*) AS BIGINT) AS n_docs
        |  FROM q GROUP BY 1, 2),
        |hist AS (
        |  SELECT l, CAST(count(*) AS BIGINT) AS n_groups,
        |    CAST(sum(n_docs) AS BIGINT) AS n_docs
        |  FROM grp GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM hist)
        |SELECT l AS l_distinct, n_groups, n_docs,
        |  CAST(CAST(sum(CASE WHEN h.l < 3 THEN h.n_docs ELSE 0 END)
        |      OVER (ORDER BY h.l) AS BIGINT) * 1000 // t AS BIGINT)
        |    AS exposed_below3_permille
        |FROM hist h, tot ORDER BY l_distinct""".stripMargin) { (s, d) =>
      val q = Tables.documents(s, d)
        .select(col("lang"), expr("n_chars div 100").as("len_bucket"),
          col("source"))
      val grp = q.groupBy(col("lang"), col("len_bucket"))
        .agg(countDistinct(col("source")).as("l"),
          count(lit(1)).as("n_docs"))
      val hist = grp.groupBy(col("l"))
        .agg(count(lit(1)).as("n_groups"), sum(col("n_docs")).cast("long")
          .as("n_docs"))
      val tot = hist.agg(sum(col("n_docs")).cast("long").as("t"))
      hist.crossJoin(broadcast(tot))
        .select(col("l").as("l_distinct"), col("n_groups"), col("n_docs"),
          expr("""cast(cast(sum(case when l < 3 then n_docs else 0 end)
            over (order by l) as bigint) * 1000 div t as bigint)""")
            .as("exposed_below3_permille"))
        .orderBy(col("l_distinct"))
    },

    // ---- C55: canary watermark planting and detection -------------------------
    // Dataset provenance: before release, a curator plants canaries —
    // a deterministic ~1/16 of documents chosen by md5 prefix (no RNG,
    // so the planting set is reproducible from the secret alone).
    // Later a suspect corpus appears (simulated here as an unrelated
    // md5-keyed half-sample). If the suspect set derived from ours,
    // canaries survive at the derivation rate; if independent, they
    // appear at the base rate. The verdict row runs the exact
    // cross-multiplied binomial test (2k-n)^2 > 4n against the fair
    // 1/2 retention null — the a152 discipline, one scan, no joins
    // beyond a broadcast total.
    QueryDef.sql(
      "c55_canary_detection",
      """WITH marked AS (
        |  SELECT source,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':canary-secret'),
        |      1, 1) = '0' THEN 1 ELSE 0 END AS planted,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':republished'),
        |      1, 1) < '8' THEN 1 ELSE 0 END AS in_suspect
        |  FROM documents),
        |per AS (
        |  SELECT source,
        |    CAST(sum(planted) AS BIGINT) AS n_planted,
        |    CAST(sum(planted * in_suspect) AS BIGINT) AS n_recovered
        |  FROM marked GROUP BY source),
        |rows_ AS (
        |  SELECT source, n_planted, n_recovered FROM per
        |  UNION ALL
        |  SELECT '__total__', CAST(sum(n_planted) AS BIGINT),
        |    CAST(sum(n_recovered) AS BIGINT) FROM per)
        |SELECT source, n_planted, n_recovered,
        |  CAST(CASE WHEN n_planted = 0 THEN 0
        |    ELSE n_recovered * 1000 // n_planted END AS BIGINT)
        |    AS recovery_permille,
        |  CASE WHEN (2 * n_recovered - n_planted) * (2 * n_recovered - n_planted)
        |    > 4 * n_planted THEN 1 ELSE 0 END AS deviates_from_half
        |FROM rows_ ORDER BY source""".stripMargin) { (s, d) =>
      val marked = Tables.documents(s, d)
        .select(col("source"),
          when(substring(md5(concat(col("doc_id").cast("string"),
            lit(":canary-secret"))), 1, 1) === "0", 1).otherwise(0).as("planted"),
          when(substring(md5(concat(col("doc_id").cast("string"),
            lit(":republished"))), 1, 1) < "8", 1).otherwise(0).as("in_suspect"))
      val per = marked.groupBy(col("source"))
        .agg(sum(col("planted")).cast("long").as("n_planted"),
          sum(col("planted") * col("in_suspect")).cast("long").as("n_recovered"))
        .localCheckpoint(true) // source rows and the total row both read it
      val total = per.agg(sum(col("n_planted")).cast("long").as("n_planted"),
          sum(col("n_recovered")).cast("long").as("n_recovered"))
        .select(lit("__total__").as("source"), col("n_planted"),
          col("n_recovered"))
      per.unionByName(total)
        .select(col("source"), col("n_planted"), col("n_recovered"),
          expr("""cast(case when n_planted = 0 then 0
            else n_recovered * 1000 div n_planted end as bigint)""")
            .as("recovery_permille"),
          when((lit(2) * col("n_recovered") - col("n_planted")) *
            (lit(2) * col("n_recovered") - col("n_planted")) >
            lit(4) * col("n_planted"), 1).otherwise(0).as("deviates_from_half"))
        .orderBy(col("source"))
    },

    // ---- U79: varint delta-encoding size planner ------------------------------
    // How many bytes does the event_id column cost under LEB128
    // varint encoding of zigzagged deltas, as a function of physical
    // order? Three candidate layouts are priced exactly: clustered
    // (sorted by id — deltas are small and positive), time-ordered
    // (the natural ingest order), and hash-scattered (the worst case a
    // shuffle leaves behind). Per 32-way shard, one window computes
    // the delta, zigzag maps it to unsigned, and the byte count is a
    // threshold ladder — pure integer algebra, so the planner's
    // bytes-per-id verdict is bit-reproducible. The u44/u48 family's
    // missing member: encoding cost, not just run/zone structure.
    QueryDef.sql(
      "u79_varint_sizing",
      """WITH sh AS (
        |  SELECT event_id, ts,
        |    CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 4))
        |      AS BIGINT) % 32 AS shard
        |  FROM events),
        |layouts AS (
        |  SELECT 'clustered_by_id' AS layout, shard, event_id,
        |    row_number() OVER (PARTITION BY shard ORDER BY event_id) AS pos
        |  FROM sh
        |  UNION ALL
        |  SELECT 'time_ordered', shard, event_id,
        |    row_number() OVER (PARTITION BY shard ORDER BY ts, event_id)
        |  FROM sh
        |  UNION ALL
        |  SELECT 'hash_scattered', shard, event_id,
        |    row_number() OVER (PARTITION BY shard
        |      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id)
        |  FROM sh),
        |deltas AS (
        |  SELECT layout,
        |    coalesce(event_id - lag(event_id) OVER (PARTITION BY layout, shard
        |      ORDER BY pos), event_id) AS dlt
        |  FROM layouts),
        |zz AS (
        |  SELECT layout,
        |    CASE WHEN dlt >= 0 THEN 2 * dlt ELSE 2 * (-dlt) - 1 END AS u
        |  FROM deltas),
        |priced AS (
        |  SELECT layout,
        |    1 + (CASE WHEN u >= 128 THEN 1 ELSE 0 END)
        |      + (CASE WHEN u >= 16384 THEN 1 ELSE 0 END)
        |      + (CASE WHEN u >= 2097152 THEN 1 ELSE 0 END)
        |      + (CASE WHEN u >= 268435456 THEN 1 ELSE 0 END) AS nbytes
        |  FROM zz)
        |SELECT layout, CAST(count(*) AS BIGINT) AS n_ids,
        |  CAST(sum(nbytes) AS BIGINT) AS total_bytes,
        |  CAST(sum(nbytes) * 1000 // count(*) AS BIGINT) AS bytes_per_id_milli,
        |  CAST(sum(nbytes) * 1000 // (count(*) * 8) AS BIGINT)
        |    AS vs_raw_permille
        |FROM priced GROUP BY layout ORDER BY layout""".stripMargin) { (s, d) =>
      val sh = Tables.events(s, d)
        .select(col("event_id"), col("ts"),
          (conv(substring(md5(col("event_id").cast("string")), 1, 4), 16, 10)
            .cast("long") % 32).as("shard"))
      def layout(name: String, order: Seq[org.apache.spark.sql.Column]): DataFrame =
        sh.withColumn("pos", row_number().over(
            Window.partitionBy(col("shard")).orderBy(order: _*)))
          .select(lit(name).as("layout"), col("shard"), col("event_id"),
            col("pos"))
      val layouts = layout("clustered_by_id", Seq(col("event_id")))
        .unionByName(layout("time_ordered", Seq(col("ts"), col("event_id"))))
        .unionByName(layout("hash_scattered",
          Seq(md5(col("event_id").cast("string")), col("event_id"))))
      val deltas = layouts.select(col("layout"),
        coalesce(col("event_id") - lag(col("event_id"), 1)
          .over(Window.partitionBy(col("layout"), col("shard"))
            .orderBy(col("pos"))), col("event_id")).as("dlt"))
      val zz = deltas.select(col("layout"),
        when(col("dlt") >= 0, lit(2) * col("dlt"))
          .otherwise(lit(2) * (-col("dlt")) - 1).as("u"))
      val priced = zz.select(col("layout"),
        (lit(1) + when(col("u") >= 128L, 1).otherwise(0)
          + when(col("u") >= 16384L, 1).otherwise(0)
          + when(col("u") >= 2097152L, 1).otherwise(0)
          + when(col("u") >= 268435456L, 1).otherwise(0)).as("nbytes"))
      priced.groupBy(col("layout"))
        .agg(count(lit(1)).as("n_ids"),
          sum(col("nbytes")).cast("long").as("total_bytes"))
        .select(col("layout"), col("n_ids"), col("total_bytes"),
          expr("cast(total_bytes * 1000 div n_ids as bigint)")
            .as("bytes_per_id_milli"),
          expr("cast(total_bytes * 1000 div (n_ids * 8) as bigint)")
            .as("vs_raw_permille"))
        .orderBy(col("layout"))
    }
  )
}
