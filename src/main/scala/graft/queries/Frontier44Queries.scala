package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Forty-fourth frontier batch: an oracle-checkable HyperLogLog sketch,
  * rendezvous (highest-random-weight) sharding, and batch CEP pattern
  * matching over per-user event strings.
  */
object Frontier44Queries {

  // Linear-counting correction table for m = 256: LC[v] = round(256·ln(256/v)
  // ·1000) for v = 1..256 zero registers. ln evaluated ONCE at authoring time
  // (the SPRT precomputed-literal discipline) so no runtime libm sits in the
  // data path — the correction is an exact integer table lookup in both
  // engines.
  private val lcTab: String =
    "1419565,1242120,1138321,1064674,1007549,960875,921412,887228,857076,830104,805704,783429,762938,743967,726305,709783,694263,679630,665789,652658,640168,628259,616879,605984,595533,585493,575831,566521,557538,548859,540465,532337,524459,516817,509396,502185,495170,488343,481694,475212,468891,462722,456698,450813,445060,439433,433928,428538,423259,418088,413018,408047,403171,398386,393688,389075,384544,380092,375716,371413,367182,363019,358923,354891,350922,347014,343164,339371,335634,331951,328319,324739,321208,317725,314288,310898,307551,304248,300987,297767,294586,291445,288342,285276,282247,279253,276293,273367,270475,267614,264785,261988,259220,256482,253773,251092,248439,245814,243215,240642,238095,235572,233075,230601,228152,225725,223321,220940,218580,216242,213926,211630,209354,207099,204863,202646,200449,198270,196110,193968,191843,189736,187646,185573,183517,181477,179454,177446,175453,173477,171515,169568,167636,165718,163815,161926,160050,158188,156340,154505,152683,150874,149077,147293,145522,143762,142015,140279,138555,136843,135142,133452,131773,130106,128449,126802,125166,123541,121926,120321,118726,117141,115565,114000,112443,110897,109359,107831,106311,104801,103300,101807,100323,98847,97380,95922,94471,93029,91595,90168,88750,87340,85937,84542,83154,81774,80402,79036,77678,76327,74983,73647,72317,70994,69678,68368,67065,65769,64479,63196,61919,60649,59385,58127,56875,55629,54389,53156,51928,50706,49490,48279,47075,45876,44682,43494,42312,41135,39963,38797,37636,36480,35329,34184,33044,31908,30778,29653,28533,27417,26306,25201,24100,23003,21912,20824,19742,18664,17591,16522,15457,14397,13342,12290,11243,10201,9162,8128,7097,6071,5049,4032,3018,2008,1002,0"

  val defs: Seq[QueryDef] = Seq(

    // ---- A100: HyperLogLog distinct sketch, bit-exact ----------------------
    // Sketches are normally rows-only (a8); this one is under the hash
    // gate because every step is deterministic integer arithmetic: the
    // register hash is the first 8 hex chars of md5 (identical in both
    // engines), rank = 25 − bitlength(w) comes from length(bin(w))
    // (no float log2), and the harmonic mean Σ 2^(−M_j) is multiplied
    // through by 2^26 so it is an exact BIGINT sum (M ≤ 25; absent
    // registers contribute 2^26 each). Estimate in milli-units is one
    // integral division by a precomputed α·m²·2^26·1000 literal
    // (m = 256, α = 0.7213/(1+1.079/m) → 47072713 milli-scaled;
    // 47072713·2^26 = 3158996294828032). The small-range regime
    // (raw ≤ 2.5m, zero registers present) applies the standard
    // linear-counting correction m·ln(m/V) — exact here because V has
    // only 256 possible values, so the correction is the lcTab integer
    // lookup, not runtime libm. The scale story is the whole
    // point of HLL: the shuffle carries ≤ 256 register rows per group
    // (mergeable partial MAX per register), never the raw keys — the
    // exact countDistinct beside it is the gate-scale luxury that a
    // 100 TB run would drop.
    QueryDef.sql(
      "a100_hll_sketch",
      s"""WITH h AS (
        |  SELECT event_type,
        |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS v
        |  FROM events),
        |b AS (SELECT event_type, v % 256 AS idx, v // 256 AS w FROM h),
        |r AS (
        |  SELECT event_type, idx,
        |    max(CASE WHEN w = 0 THEN 25 ELSE 25 - length(bin(w)) END) AS m
        |  FROM b GROUP BY 1, 2),
        |sk AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS nregs,
        |    CAST(sum(1::BIGINT << (26 - m)) AS BIGINT) AS sp
        |  FROM r GROUP BY 1),
        |est AS (
        |  SELECT event_type, CAST(256 - nregs AS BIGINT) AS zero_regs,
        |    CAST(3158996294828032 // (sp + (256 - nregs) * 67108864) AS BIGINT)
        |      AS raw_milli
        |  FROM sk),
        |cor AS (
        |  SELECT event_type, zero_regs,
        |    CAST(CASE WHEN zero_regs > 0 AND raw_milli <= 640000
        |      THEN [$lcTab][CAST(zero_regs AS INT)]
        |      ELSE raw_milli END AS BIGINT) AS hll_milli
        |  FROM est),
        |ex AS (
        |  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
        |  FROM events GROUP BY 1)
        |SELECT ex.event_type, ex.n_exact, cor.hll_milli, cor.zero_regs,
        |  CAST(abs(cor.hll_milli - ex.n_exact * 1000) * 1000
        |    // (ex.n_exact * 1000) AS BIGINT) AS err_permille
        |FROM ex JOIN cor ON ex.event_type = cor.event_type""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val regs = ev
        .select(col("event_type"),
          expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
            .as("v"))
        .select(col("event_type"), (col("v") % 256).as("idx"), expr("v div 256").as("w"))
        .withColumn("rank",
          when(col("w") === 0, lit(25)).otherwise(lit(25) - length(bin(col("w")))))
        .groupBy(col("event_type"), col("idx"))
        .agg(max(col("rank")).as("m"))
      val sketch = regs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("nregs"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(26 - m AS INT))")).as("sp"))
        .select(col("event_type"), (lit(256L) - col("nregs")).as("zero_regs"),
          expr("3158996294828032 div (sp + (256 - nregs) * 67108864)").as("raw_milli"))
        .select(col("event_type"), col("zero_regs"),
          when(col("zero_regs") > 0 && col("raw_milli") <= 640000L,
            expr(s"element_at(array($lcTab), CAST(zero_regs AS INT))").cast("long"))
            .otherwise(col("raw_milli")).as("hll_milli"))
      val exact = ev.groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(broadcast(sketch), "event_type")
        .select(col("event_type"), col("n_exact"), col("hll_milli"), col("zero_regs"),
          expr("abs(hll_milli - n_exact * 1000) * 1000 div (n_exact * 1000)")
            .as("err_permille"))
    },

    // ---- U38: rendezvous (HRW) sharding + resize movement ------------------
    // The distributed-placement primitive: each key goes to
    // argmax_s md5(key ':' s). Unlike mod-N hashing, growing 8 → 9
    // shards moves only the keys whose new shard wins the argmax —
    // ~1/9 of them — which this query measures exactly per shard.
    // The assignment is computed per row with ZERO shuffle:
    // array_max over an inline array<struct<h,s>> (struct ordering =
    // lexicographic on the md5 hex), so at 100 TB the only exchange is
    // the final 8-group count. The oracle takes the naive route
    // (8-way fan-out + arg_max).
    QueryDef.sql(
      "u38_rendezvous_shards",
      """WITH a8 AS (
        |  SELECT doc_id,
        |    arg_max(i, md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR))) AS s8
        |  FROM documents CROSS JOIN range(0, 8) t(i) GROUP BY doc_id),
        |a9 AS (
        |  SELECT doc_id,
        |    arg_max(i, md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR))) AS s9
        |  FROM documents CROSS JOIN range(0, 9) t(i) GROUP BY doc_id),
        |j AS (SELECT a8.s8, a9.s9 FROM a8 JOIN a9 ON a8.doc_id = a9.doc_id)
        |SELECT CAST(s8 AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) FILTER (WHERE s9 <> s8) AS BIGINT) AS n_moved,
        |  CAST(count(*) FILTER (WHERE s9 <> s8) * 1000 // count(*) AS BIGINT)
        |    AS moved_permille
        |FROM j GROUP BY 1""".stripMargin) { (s, d) =>
      def assign(n: Int): org.apache.spark.sql.Column = expr(
        s"""array_max(transform(sequence(0, ${n - 1},1),
           |  i -> struct(md5(concat(CAST(doc_id AS STRING), ':', CAST(i AS STRING))) AS h,
           |              i AS s)))""".stripMargin)
      Tables.documents(s, d)
        .select(col("doc_id"), assign(8).as("a8"), assign(9).as("a9"))
        .select(col("a8.s").cast("long").as("shard"),
          (col("a9.s") =!= col("a8.s")).cast("long").as("moved"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("moved")).as("n_moved"))
        .select(col("shard"), col("n_docs"), col("n_moved"),
          expr("n_moved * 1000 div n_docs").as("moved_permille"))
    },

    // ---- EV66: batch CEP — regex over per-user event strings ---------------
    // MATCH_RECOGNIZE-style complex-event detection without the
    // stateful operator: each user's journey collapses to one ordered
    // string (one char per event — click/error/purchase/signup/view
    // have distinct initials), and patterns are plain regexes counted
    // non-overlapping left-to-right (identical semantics in Java regex
    // and RE2 for these greedy patterns). 'vc*p' = a view converting
    // through clicks to purchase; 'e+p' = purchase immediately
    // recovering from errors. Grain is user-bounded (collect_list over
    // one user's events — the KM/ordered-fold discipline), so the one
    // shuffle is the per-user groupBy and pattern work is codegen'd
    // string ops.
    QueryDef.sql(
      "ev66_cep_regex",
      """WITH j AS (
        |  SELECT user_id,
        |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS journey
        |  FROM events GROUP BY 1),
        |m AS (
        |  SELECT user_id,
        |    length(regexp_extract_all(journey, 'vc*p')) AS f,
        |    length(regexp_extract_all(journey, 'e+p')) AS r
        |  FROM j)
        |SELECT CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(count(*) FILTER (WHERE f > 0) AS BIGINT) AS funnel_users,
        |  CAST(sum(f) AS BIGINT) AS funnel_matches,
        |  CAST(count(*) FILTER (WHERE r > 0) AS BIGINT) AS recovery_users,
        |  CAST(sum(r) AS BIGINT) AS recovery_matches
        |FROM m""".stripMargin) { (s, d) =>
      val j = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c"))
        .groupBy(col("user_id"))
        .agg(expr(
          "array_join(transform(array_sort(collect_list(struct(ts, event_id, c))), x -> x.c), '')")
          .as("journey"))
      j.select(
          expr("regexp_count(journey, 'vc*p')").as("f"),
          expr("regexp_count(journey, 'e+p')").as("r"))
        .agg(count(lit(1)).as("n_users"),
          count(when(col("f") > 0, 1)).as("funnel_users"),
          sum(col("f")).cast("long").as("funnel_matches"),
          count(when(col("r") > 0, 1)).as("recovery_users"),
          sum(col("r")).cast("long").as("recovery_matches"))
    }
  )
}
