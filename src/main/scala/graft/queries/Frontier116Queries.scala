package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Hundred-sixteenth frontier batch: storage/topology planners — Hilbert
  * vs Z-order vs row-major page locality measured on real data (the
  * space-filling-curve bit transforms run as integer folds, exact in
  * both engines), consistent-hash ring rebalance audit (how many keys
  * actually move when a shard joins), and positional phrase search over
  * an inverted index with positions.
  */
object Frontier116Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- U87: Hilbert vs Z-order vs row-major page locality --------------------
    // Orders mapped to a 256x256 grid (x = order date scaled, y =
    // customer key scaled), indexed by three curves: Hilbert (the
    // classic xy2d bit loop — 8 levels of rotate/flip as an integer
    // fold), Z-order (bit interleave), and row-major. Pages hold 256
    // consecutive index cells; four canonical range rectangles count
    // how many pages each curve touches. The fewer pages for the same
    // selectivity, the better the clustering — the exact trade a
    // Z-ORDER BY / cluster-key choice makes at 100 TB, here measured
    // rather than asserted. Everything is one scan + codegen folds;
    // the only shuffle is the final 12-group aggregate.
    QueryDef.sql(
      "u87_hilbert_locality",
      """WITH spans AS (
        |  SELECT CAST(min(CAST(o_orderdate AS DATE)) AS DATE) AS d0,
        |    CAST(date_diff('day', min(CAST(o_orderdate AS DATE)),
        |      max(CAST(o_orderdate AS DATE))) AS BIGINT) AS dspan,
        |    CAST(max(o_custkey) AS BIGINT) AS ckmax
        |  FROM orders),
        |pts AS (
        |  SELECT o_orderkey,
        |    CAST(date_diff('day', s.d0, CAST(o_orderdate AS DATE)) AS BIGINT)
        |      * 256 // (s.dspan + 1) AS x,
        |    o_custkey * 256 // (s.ckmax + 1) AS y
        |  FROM orders CROSS JOIN spans s),
        |idx AS (
        |  SELECT o_orderkey, x, y,
        |    list_reduce(list_prepend([x, y, CAST(0 AS BIGINT)],
        |      list_transform([128, 64, 32, 16, 8, 4, 2, 1],
        |        s -> [CAST(s AS BIGINT), s, s])),
        |      (acc, e) -> [
        |        CASE WHEN (acc[2] & e[1]) > 0 THEN acc[1]
        |          WHEN (acc[1] & e[1]) > 0 THEN e[1] - 1 - acc[2]
        |          ELSE acc[2] END,
        |        CASE WHEN (acc[2] & e[1]) > 0 THEN acc[2]
        |          WHEN (acc[1] & e[1]) > 0 THEN e[1] - 1 - acc[1]
        |          ELSE acc[1] END,
        |        acc[3] + e[1] * e[1] * xor(
        |          3 * (CASE WHEN (acc[1] & e[1]) > 0 THEN 1 ELSE 0 END),
        |          CASE WHEN (acc[2] & e[1]) > 0 THEN 1 ELSE 0 END)])[3]
        |      AS hilbert,
        |    list_reduce(list_prepend(CAST(0 AS BIGINT),
        |      list_transform([0, 1, 2, 3, 4, 5, 6, 7], i -> CAST(i AS BIGINT))),
        |      (acc, i) -> acc + (((x >> i) & 1) << (2 * i + 1))
        |        + (((y >> i) & 1) << (2 * i))) AS zorder,
        |    x * 256 + y AS rowmajor
        |  FROM pts),
        |m0 AS (
        |  SELECT o_orderkey, x, y,
        |    unnest([{'curve': 'hilbert', 'i': hilbert},
        |      {'curve': 'zorder', 'i': zorder},
        |      {'curve': 'rowmajor', 'i': rowmajor}]) AS u
        |  FROM idx),
        |m AS (SELECT o_orderkey, x, y, u.curve, u.i FROM m0),
        |rects AS (
        |  SELECT * FROM (VALUES
        |    ('date_slab', 0, 31, 0, 255), ('cust_slab', 0, 255, 0, 31),
        |    ('square_64', 64, 127, 64, 127), ('square_16', 0, 15, 0, 15))
        |    AS r(rect, x0, x1, y0, y1))
        |SELECT r.rect, m.curve,
        |  CAST(count(*) AS BIGINT) AS n_points,
        |  CAST(count(DISTINCT m.i // 256) AS BIGINT) AS pages_touched
        |FROM m JOIN rects r
        |  ON m.x BETWEEN r.x0 AND r.x1 AND m.y BETWEEN r.y0 AND r.y1
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val spans = Tables.orders(s, d).agg(
        min(col("o_orderdate").cast("date")).as("d0"),
        datediff(max(col("o_orderdate").cast("date")),
          min(col("o_orderdate").cast("date"))).cast("long").as("dspan"),
        max(col("o_custkey")).cast("long").as("ckmax"))
      val pts = Tables.orders(s, d).crossJoin(broadcast(spans))
        .select(col("o_orderkey"),
          expr("cast(datediff(cast(o_orderdate as date), d0) as bigint)" +
            " * 256 div (dspan + 1)").as("x"),
          expr("o_custkey * 256 div (ckmax + 1)").as("y"))
      val idx = pts
        .withColumn("hilbert", expr(
          """aggregate(array(128L, 64L, 32L, 16L, 8L, 4L, 2L, 1L),
            |  array(x, y, cast(0 as bigint)),
            |  (acc, s) -> array(
            |    CASE WHEN (acc[1] & s) > 0 THEN acc[0]
            |      WHEN (acc[0] & s) > 0 THEN s - 1 - acc[1] ELSE acc[1] END,
            |    CASE WHEN (acc[1] & s) > 0 THEN acc[1]
            |      WHEN (acc[0] & s) > 0 THEN s - 1 - acc[0] ELSE acc[0] END,
            |    acc[2] + s * s * (
            |      (3 * (CASE WHEN (acc[0] & s) > 0 THEN 1L ELSE 0L END))
            |      ^ (CASE WHEN (acc[1] & s) > 0 THEN 1L ELSE 0L END))),
            |  acc -> acc[2])""".stripMargin))
        .withColumn("zorder", expr(
          """aggregate(sequence(0, 7), cast(0 as bigint),
            |  (acc, i) -> acc + (((x >> i) & 1) << (2 * i + 1))
            |    + (((y >> i) & 1) << (2 * i)))""".stripMargin))
        .withColumn("rowmajor", expr("x * 256 + y"))
      val m = idx.select(col("o_orderkey"), col("x"), col("y"),
        explode(array(
          struct(lit("hilbert").as("curve"), col("hilbert").as("i")),
          struct(lit("zorder").as("curve"), col("zorder").as("i")),
          struct(lit("rowmajor").as("curve"), col("rowmajor").as("i"))))
          .as("u"))
        .select(col("o_orderkey"), col("x"), col("y"),
          col("u.curve").as("curve"), col("u.i").as("i"))
      val rects = s.createDataFrame(Seq(
        ("date_slab", 0, 31, 0, 255), ("cust_slab", 0, 255, 0, 31),
        ("square_64", 64, 127, 64, 127), ("square_16", 0, 15, 0, 15)))
        .toDF("rect", "x0", "x1", "y0", "y1")
      m.join(broadcast(rects),
          col("x").between(col("x0"), col("x1"))
            && col("y").between(col("y0"), col("y1")))
        .groupBy(col("rect"), col("curve"))
        .agg(count(lit(1)).cast("long").as("n_points"),
          countDistinct(expr("i div 256")).cast("long").as("pages_touched"))
        .orderBy(col("rect"), col("curve"))
    },

    // ---- U88: consistent-hash ring rebalance audit ------------------------------
    // 8 shards x 16 virtual nodes on a 2^32 ring (positions from md5,
    // identical in both engines; shard id folded into the low 4 bits
    // so ties can't fan out). Every customer key is assigned by the
    // classic clockwise-successor lookup — here a filter + min over the
    // 128-element ring array shipped as one broadcast value, the exact
    // shape a 100 TB partitioner uses. Then shard 8 joins (16 new
    // vnodes) and the audit counts, per shard, how many keys it gains
    // and loses: consistent hashing's contract is that ONLY keys
    // landing in the new shard's arcs move (~1/9), vs a mod-N rehash
    // that moves ~8/9.
    QueryDef.sql(
      "u88_hash_ring_migration",
      """WITH vn AS (
        |  SELECT sh.sh, v.v,
        |    (('0x' || substr(md5(CAST(sh.sh AS VARCHAR) || ':'
        |      || CAST(v.v AS VARCHAR)), 1, 15))::BIGINT % 4294967296) * 16
        |      + sh.sh AS val
        |  FROM (SELECT unnest(generate_series(0, 8)) AS sh) sh
        |  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS v) v),
        |ringa AS (
        |  SELECT list(val ORDER BY val) AS ring FROM vn WHERE sh < 8),
        |ringb AS (SELECT list(val ORDER BY val) AS ring FROM vn),
        |keys AS (
        |  SELECT c_custkey AS k,
        |    ('0x' || substr(md5('k:' || CAST(c_custkey AS VARCHAR)), 1, 15))
        |      ::BIGINT % 4294967296 AS kh
        |  FROM customer),
        |assigned AS (
        |  SELECT k, kh,
        |    coalesce(list_aggregate(list_filter(a.ring, x -> x // 16 >= kh),
        |        'min'), a.ring[1]) % 16 AS shard_a,
        |    coalesce(list_aggregate(list_filter(b.ring, x -> x // 16 >= kh),
        |        'min'), b.ring[1]) % 16 AS shard_b
        |  FROM keys CROSS JOIN ringa a CROSS JOIN ringb b),
        |shards AS (SELECT unnest(generate_series(0, 8)) AS shard)
        |SELECT CAST(s.shard AS INT) AS shard,
        |  CAST(count(*) FILTER (WHERE a.shard_a = s.shard) AS BIGINT)
        |    AS n_before,
        |  CAST(count(*) FILTER (WHERE a.shard_b = s.shard) AS BIGINT)
        |    AS n_after,
        |  CAST(count(*) FILTER (WHERE a.shard_b = s.shard
        |    AND a.shard_a <> s.shard) AS BIGINT) AS gained,
        |  CAST(count(*) FILTER (WHERE a.shard_a = s.shard
        |    AND a.shard_b <> s.shard) AS BIGINT) AS lost
        |FROM shards s CROSS JOIN assigned a
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val vn = s.range(0, 9).select(col("id").as("sh"))
        .crossJoin(s.range(0, 16).select(col("id").as("v")))
        .select(col("sh"), col("v"),
          ((conv(substring(md5(concat(col("sh").cast("string"), lit(":"),
            col("v").cast("string"))), 1, 15), 16, 10).cast("long")
            % 4294967296L) * 16 + col("sh")).as("val"))
      val ringa = vn.filter(col("sh") < 8)
        .agg(sort_array(collect_list(col("val"))).as("ring_a"))
      val ringb = vn.agg(sort_array(collect_list(col("val"))).as("ring_b"))
      val keys = Tables.customer(s, d).select(col("c_custkey").as("k"),
        (conv(substring(md5(concat(lit("k:"), col("c_custkey").cast("string"))),
          1, 15), 16, 10).cast("long") % 4294967296L).as("kh"))
      val assigned = keys.crossJoin(broadcast(ringa)).crossJoin(broadcast(ringb))
        .select(col("k"), col("kh"),
          expr("coalesce(array_min(filter(ring_a, x -> x div 16 >= kh))," +
            " ring_a[0]) % 16").as("shard_a"),
          expr("coalesce(array_min(filter(ring_b, x -> x div 16 >= kh))," +
            " ring_b[0]) % 16").as("shard_b"))
      val shards = s.range(0, 9).select(col("id").cast("int").as("shard"))
      broadcast(shards).crossJoin(assigned)
        .groupBy(col("shard"))
        .agg(
          count(when(col("shard_a") === col("shard"), 1)).cast("long")
            .as("n_before"),
          count(when(col("shard_b") === col("shard"), 1)).cast("long")
            .as("n_after"),
          count(when(col("shard_b") === col("shard")
            && col("shard_a") =!= col("shard"), 1)).cast("long").as("gained"),
          count(when(col("shard_a") === col("shard")
            && col("shard_b") =!= col("shard"), 1)).cast("long").as("lost"))
        .orderBy(col("shard"))
    },

    // ---- T89: positional phrase search ------------------------------------------
    // Phrase queries over an inverted index WITH positions — the
    // retrieval feature doc-level postings (t17/t22) can't answer.
    // Postings carry (doc, pos); a phrase match is a posting-list
    // intersection shifted by one (and by two for the trigram), i.e.
    // self-joins on (doc, pos+1) after the term predicate has pruned
    // the posting scan. One shuffle on doc_id; term filters push into
    // the scan side.
    QueryDef.sql(
      "t89_phrase_search",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ts
        |  FROM documents),
        |post0 AS (
        |  SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
        |    i -> {'pos': i, 'term': ts[i]})) AS u
        |  FROM toks),
        |post AS (SELECT doc_id, u.pos, u.term FROM post0),
        |p2 AS (SELECT * FROM (VALUES ('table scan', 'table', 'scan'),
        |  ('hash join', 'hash', 'join'), ('sort merge', 'sort', 'merge'))
        |  AS t(phrase, w1, w2)),
        |p3 AS (SELECT * FROM (VALUES
        |  ('sort merge join', 'sort', 'merge', 'join'))
        |  AS t(phrase, w1, w2, w3)),
        |m2 AS (
        |  SELECT q.phrase, a.doc_id
        |  FROM p2 q
        |  JOIN post a ON a.term = q.w1
        |  JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |    AND b.term = q.w2),
        |m3 AS (
        |  SELECT q.phrase, a.doc_id
        |  FROM p3 q
        |  JOIN post a ON a.term = q.w1
        |  JOIN post b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |    AND b.term = q.w2
        |  JOIN post c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        |    AND c.term = q.w3),
        |hits AS (SELECT phrase, doc_id FROM m2
        |  UNION ALL SELECT phrase, doc_id FROM m3)
        |SELECT phrase, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_hits
        |FROM hits GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val post = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(TextFunctions.tokens(col("text"))).as(Seq("p0", "term")))
        .select(col("doc_id"), (col("p0") + 1).as("pos"), col("term"))
      val p2 = s.createDataFrame(Seq(
        ("table scan", "table", "scan"), ("hash join", "hash", "join"),
        ("sort merge", "sort", "merge"))).toDF("phrase", "w1", "w2")
      val p3 = s.createDataFrame(Seq(
        Tuple4("sort merge join", "sort", "merge", "join")))
        .toDF("phrase", "w1", "w2", "w3")
      val m2 = broadcast(p2)
        .join(post.as("a"), col("a.term") === col("w1"))
        .join(post.as("b"),
          col("b.doc_id") === col("a.doc_id")
            && col("b.pos") === col("a.pos") + 1 && col("b.term") === col("w2"))
        .select(col("phrase"), col("a.doc_id").as("doc_id"))
      val m3 = broadcast(p3)
        .join(post.as("a"), col("a.term") === col("w1"))
        .join(post.as("b"),
          col("b.doc_id") === col("a.doc_id")
            && col("b.pos") === col("a.pos") + 1 && col("b.term") === col("w2"))
        .join(post.as("c"),
          col("c.doc_id") === col("a.doc_id")
            && col("c.pos") === col("a.pos") + 2 && col("c.term") === col("w3"))
        .select(col("phrase"), col("a.doc_id").as("doc_id"))
      m2.unionByName(m3).groupBy(col("phrase"))
        .agg(countDistinct(col("doc_id")).cast("long").as("n_docs"),
          count(lit(1)).cast("long").as("n_hits"))
        .orderBy(col("phrase"))
    }
  )
}
