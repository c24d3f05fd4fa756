package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Hundred-twelfth frontier batch: the sketch trilogy under the exact
  * hash gate — HyperLogLog registers audited with a common-denominator
  * Kraft-style sum (no float harmonic mean), Count-Min overestimates
  * measured against true counts, and a Bloom filter's actual false-
  * positive rate per nation. All hashing is md5 hex slices, identical
  * in both engines, so every register/bucket/bit is bit-reproducible.
  */
object Frontier112Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- A179: HyperLogLog audit in exact integer arithmetic -------------------
    // The one sketch family that had only a rows-only row (a8) now
    // gets a full oracle: 256 HLL registers built from a 60-bit md5
    // hash (low 8 bits pick the register, the upper 52 feed
    // rho = 53 - bitlength). The harmonic mean's sum(2^-M_j) is kept
    // EXACT by multiplying through by 2^53 — sum(1 << (53-M_j)) is a
    // BIGINT (max 256*2^53 < 2^62) — and the raw Flajolet estimate
    // alpha_256 * m^2 / Z becomes one HUGEINT/DECIMAL(38,0) integral
    // divide with alpha_256 baked as 718273 micro-units
    // (0.7213/(1+1.079/256)). No small-range linear-counting switch
    // (it needs a logarithm): instead the small_range flag marks
    // where a production HLL would switch, so the audit shows the raw
    // estimator's bias exactly in the region the correction exists for.
    QueryDef.sql(
      "a179_hll_audit",
      """WITH keys AS (
        |  SELECT 'customer' AS entity,
        |    md5('c:' || CAST(c_custkey AS VARCHAR)) AS hx FROM customer
        |  UNION ALL SELECT 'order',
        |    md5('o:' || CAST(o_orderkey AS VARCHAR)) FROM orders
        |  UNION ALL SELECT 'part',
        |    md5('p:' || CAST(l_partkey AS VARCHAR)) FROM lineitem
        |  UNION ALL SELECT 'supplier',
        |    md5('s:' || CAST(s_suppkey AS VARCHAR)) FROM supplier),
        |exact AS (
        |  SELECT entity, CAST(count(DISTINCT hx) AS BIGINT) AS nd
        |  FROM keys GROUP BY 1),
        |hashed AS (
        |  SELECT entity, ('0x' || substr(hx, 1, 15))::BIGINT AS h FROM keys),
        |regs AS (
        |  SELECT entity, h % 256 AS j,
        |    max(CASE WHEN h // 256 = 0 THEN 53
        |      ELSE 53 - CAST(length(bin(h // 256)) AS BIGINT) END) AS m
        |  FROM hashed GROUP BY 1, 2),
        |grid AS (
        |  SELECT e.entity, gs.j
        |  FROM (SELECT DISTINCT entity FROM keys) e
        |  CROSS JOIN (SELECT unnest(generate_series(0, 255)) AS j) gs),
        |filled AS (
        |  SELECT g.entity, coalesce(r.m, 0) AS m
        |  FROM grid g LEFT JOIN regs r ON r.entity = g.entity AND r.j = g.j),
        |agg AS (
        |  SELECT entity,
        |    CAST(sum(1::BIGINT << CAST(53 - m AS INT)) AS BIGINT) AS s,
        |    CAST(count(*) FILTER (WHERE m = 0) AS BIGINT) AS v
        |  FROM filled GROUP BY 1),
        |est AS (
        |  SELECT entity, s, v,
        |    CAST(CAST(718273 AS HUGEINT) * 65536 * 9007199254740992
        |      // s // 1000000 AS BIGINT) AS e_raw
        |  FROM agg)
        |SELECT e.entity, x.nd AS exact_distinct, e.e_raw AS hll_estimate,
        |  CAST((e.e_raw - x.nd) * 1000 // x.nd AS BIGINT) AS err_permille,
        |  e.v AS empty_registers,
        |  CAST(CASE WHEN e.e_raw * 2 <= 1280 AND e.v > 0
        |    THEN 1 ELSE 0 END AS INT) AS small_range
        |FROM est e JOIN exact x ON x.entity = e.entity
        |ORDER BY e.entity""".stripMargin) { (s, d) =>
      def keyed(df: DataFrame, entity: String, tag: String, c: String) =
        df.select(lit(entity).as("entity"),
          md5(concat(lit(tag + ":"), col(c).cast("string"))).as("hx"))
      val keys = keyed(Tables.customer(s, d), "customer", "c", "c_custkey")
        .unionByName(keyed(Tables.orders(s, d), "order", "o", "o_orderkey"))
        .unionByName(keyed(Tables.lineitem(s, d), "part", "p", "l_partkey"))
        .unionByName(keyed(Tables.supplier(s, d), "supplier", "s", "s_suppkey"))
      val exact = keys.groupBy(col("entity"))
        .agg(countDistinct(col("hx")).cast("long").as("nd"))
      val hashed = keys.select(col("entity"),
        conv(substring(col("hx"), 1, 15), 16, 10).cast("long").as("h"))
      val regs = hashed
        .groupBy(col("entity"), (col("h") % 256).as("j"))
        .agg(max(when(expr("h div 256") === 0, 53L)
          .otherwise(lit(53L) - length(bin(expr("h div 256"))).cast("long")))
          .as("m"))
      val grid = keys.select(col("entity")).distinct()
        .crossJoin(s.range(0, 256).select(col("id").as("j")))
      val filled = grid.join(regs, Seq("entity", "j"), "left")
        .select(col("entity"), coalesce(col("m"), lit(0L)).as("m"))
      val agg = filled.groupBy(col("entity"))
        .agg(expr("sum(cast(1 as bigint) << cast(53 - m as int))").cast("long")
          .as("s"),
          count(when(col("m") === 0, 1)).cast("long").as("v"))
      val est = agg.select(col("entity"), col("s"), col("v"),
        expr("cast(718273 as decimal(38,0)) * 65536 * 9007199254740992 " +
          "div s div 1000000").cast("long").as("e_raw"))
      est.join(exact, Seq("entity"))
        .select(col("entity"), col("nd").as("exact_distinct"),
          col("e_raw").as("hll_estimate"),
          expr("(e_raw - nd) * 1000 div nd").cast("long").as("err_permille"),
          col("v").as("empty_registers"),
          when(col("e_raw") * 2 <= 1280 && col("v") > 0, 1).otherwise(0)
            .cast("int").as("small_range"))
        .orderBy(col("entity"))
    },

    // ---- T88: Count-Min sketch overestimate census -----------------------------
    // A 3x16 Count-Min over the document token stream, deliberately
    // undersized so collisions are guaranteed and the audit has
    // something to measure: each term's estimate is the MIN over
    // three row buckets, each bucket the exact sum of colliding
    // term counts — overestimate = est - true is exact, nonnegative
    // by construction, and the permille-of-stream column is the
    // quantity the e*N/w guarantee bounds. The sketch build is two
    // aggregations (term counts, then 48 bucket sums); the estimate
    // is a broadcast join back onto the vocabulary.
    QueryDef.sql(
      "t88_countmin",
      """WITH tok AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS term
        |  FROM documents),
        |tc AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM tc),
        |rows3 AS (SELECT unnest(generate_series(0, 2)) AS i),
        |hashed AS (
        |  SELECT t.term, t.c, r.i,
        |    ('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || t.term), 1, 15))
        |      ::BIGINT % 16 AS b
        |  FROM tc t CROSS JOIN rows3 r),
        |cms AS (
        |  SELECT i, b, CAST(sum(c) AS BIGINT) AS bucket
        |  FROM hashed GROUP BY 1, 2),
        |est AS (
        |  SELECT h.term, h.c, CAST(min(m.bucket) AS BIGINT) AS est
        |  FROM hashed h JOIN cms m ON m.i = h.i AND m.b = h.b
        |  GROUP BY 1, 2)
        |SELECT e.term, e.c AS true_cnt, e.est AS est_cnt,
        |  e.est - e.c AS overest,
        |  CAST((e.est - e.c) * 1000 // n.n AS BIGINT) AS overest_permille_of_n
        |FROM est e CROSS JOIN n
        |ORDER BY e.term""".stripMargin) { (s, d) =>
      val tc = Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).cast("long").as("c"))
      val n = tc.agg(sum(col("c")).cast("long").as("n"))
      val rows3 = s.range(0, 3).select(col("id").as("i"))
      val hashed = tc.crossJoin(broadcast(rows3))
        .select(col("term"), col("c"), col("i"),
          (conv(substring(md5(concat(col("i").cast("string"), lit(":"),
            col("term"))), 1, 15), 16, 10).cast("long") % 16).as("b"))
      val cms = hashed.groupBy(col("i"), col("b"))
        .agg(sum(col("c")).cast("long").as("bucket"))
      val est = hashed.join(broadcast(cms), Seq("i", "b"))
        .groupBy(col("term"), col("c"))
        .agg(min(col("bucket")).cast("long").as("est"))
      est.crossJoin(broadcast(n))
        .select(col("term"), col("c").as("true_cnt"), col("est").as("est_cnt"),
          (col("est") - col("c")).as("overest"),
          expr("(est - c) * 1000 div n").cast("long")
            .as("overest_permille_of_n"))
        .orderBy(col("term"))
    },

    // ---- U85: Bloom filter false-positive audit --------------------------------
    // A 1024-bit, k=3 Bloom filter over the active-customer key set
    // (customers with at least one order), probed with EVERY customer
    // and reconciled per nation: members must all pass (the zero-
    // false-negative invariant is emitted as member_hits vs
    // n_members), and the flagged non-members are the actual false
    // positives, reported in permille next to the filter's exact bit
    // fill. The filter itself is a <=1024-row distinct-positions
    // table — the degenerate (and broadcastable) form of the real
    // bitmap — so membership is a 3-row join counting hits, exactly
    // the shape a scaled run keeps.
    QueryDef.sql(
      "u85_bloom_fpr",
      """WITH members AS (
        |  SELECT DISTINCT o_custkey AS k FROM orders),
        |pos3 AS (SELECT unnest(generate_series(0, 2)) AS i),
        |set_bits AS (
        |  SELECT DISTINCT
        |    ('0x' || substr(md5(CAST(i AS VARCHAR) || ':'
        |      || CAST(k AS VARCHAR)), 1, 15))::BIGINT % 1024 AS pos
        |  FROM members CROSS JOIN pos3),
        |fill AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM set_bits),
        |probe AS (
        |  SELECT c.c_custkey AS k, c.c_nationkey AS nk,
        |    CASE WHEN m.k IS NULL THEN 0 ELSE 1 END AS is_member
        |  FROM customer c LEFT JOIN members m ON m.k = c.c_custkey),
        |probed AS (
        |  SELECT p.k, p.nk, p.is_member,
        |    CAST(count(s.pos) AS BIGINT) AS hits
        |  FROM probe p CROSS JOIN pos3 i
        |  LEFT JOIN set_bits s ON s.pos =
        |    ('0x' || substr(md5(CAST(i.i AS VARCHAR) || ':'
        |      || CAST(p.k AS VARCHAR)), 1, 15))::BIGINT % 1024
        |  GROUP BY 1, 2, 3)
        |SELECT n.n_name AS nation,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(p.is_member) AS BIGINT) AS n_members,
        |  CAST(count(*) FILTER (WHERE p.is_member = 1 AND p.hits = 3)
        |    AS BIGINT) AS member_hits,
        |  CAST(count(*) FILTER (WHERE p.is_member = 0) AS BIGINT)
        |    AS n_nonmembers,
        |  CAST(count(*) FILTER (WHERE p.is_member = 0 AND p.hits = 3)
        |    AS BIGINT) AS false_positives,
        |  CAST(CASE WHEN count(*) FILTER (WHERE p.is_member = 0) = 0 THEN 0
        |    ELSE count(*) FILTER (WHERE p.is_member = 0 AND p.hits = 3) * 1000
        |      // count(*) FILTER (WHERE p.is_member = 0) END AS BIGINT)
        |    AS fp_permille,
        |  CAST(f.bits_set * 1000 // 1024 AS BIGINT) AS fill_permille
        |FROM probed p
        |JOIN nation n ON n.n_nationkey = p.nk
        |CROSS JOIN fill f
        |GROUP BY n.n_name, f.bits_set
        |ORDER BY nation""".stripMargin) { (s, d) =>
      val members = Tables.orders(s, d)
        .select(col("o_custkey").as("k")).distinct()
      val pos3 = s.range(0, 3).select(col("id").as("i"))
      def bloomPos(i: org.apache.spark.sql.Column, k: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(i.cast("string"), lit(":"),
          k.cast("string"))), 1, 15), 16, 10).cast("long") % 1024
      val setBits = members.crossJoin(broadcast(pos3))
        .select(bloomPos(col("i"), col("k")).as("pos")).distinct()
      val fill = setBits.agg(count(lit(1)).cast("long").as("bits_set"))
      val probe = Tables.customer(s, d)
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"))
        .join(members.select(col("k"), lit(1).as("mf")), Seq("k"), "left")
        .select(col("k"), col("nk"),
          when(col("mf").isNull, 0).otherwise(1).as("is_member"))
      val probed = probe.crossJoin(broadcast(pos3))
        .withColumn("pos", bloomPos(col("i"), col("k")))
        .join(broadcast(setBits.select(col("pos"), lit(1).as("hit"))),
          Seq("pos"), "left")
        .groupBy(col("k"), col("nk"), col("is_member"))
        .agg(count(col("hit")).cast("long").as("hits"))
      probed
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("nk"), col("n_name").as("nation"))),
          Seq("nk"))
        .crossJoin(broadcast(fill))
        .groupBy(col("nation"), col("bits_set"))
        .agg(count(lit(1)).cast("long").as("n_customers"),
          sum(col("is_member")).cast("long").as("n_members"),
          count(when(col("is_member") === 1 && col("hits") === 3, 1))
            .cast("long").as("member_hits"),
          count(when(col("is_member") === 0, 1)).cast("long").as("n_nonmembers"),
          count(when(col("is_member") === 0 && col("hits") === 3, 1))
            .cast("long").as("false_positives"))
        .select(col("nation"), col("n_customers"), col("n_members"),
          col("member_hits"), col("n_nonmembers"), col("false_positives"),
          when(col("n_nonmembers") === 0, 0L)
            .otherwise(expr("false_positives * 1000 div n_nonmembers"))
            .cast("long").as("fp_permille"),
          expr("bits_set * 1000 div 1024").cast("long").as("fill_permille"))
        .orderBy(col("nation"))
    }
  )
}
