package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Fifty-ninth frontier batch: keyset pagination, systematic
  * importance resampling, dictionary-encoding planner.
  */
object Frontier59Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- U43: keyset pagination ---------------------------------------------
    // The API-serving pattern OFFSET can't survive at scale (OFFSET n
    // scans n rows; a keyset seek scans none): the cursor is the last
    // key tuple of the previous page, the page is WHERE key > cursor
    // ORDER BY key LIMIT k. Both the cursor derivation (max of the
    // first 100 rows) and the page are TakeOrdered top-k plans — no
    // global sort anywhere. Tuple comparison is the engine's native
    // struct/row ordering in both Spark and DuckDB.
    QueryDef.sql(
      "u43_keyset_pagination",
      """WITH cursor AS (
        |  SELECT max(k) AS c FROM (
        |    SELECT (l_shipdate, l_orderkey, l_linenumber) AS k
        |    FROM lineitem
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber LIMIT 100)),
        |page AS (
        |  SELECT l_shipdate, l_orderkey, l_linenumber,
        |    CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem, cursor
        |  WHERE (l_shipdate, l_orderkey, l_linenumber) > cursor.c
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber LIMIT 50)
        |SELECT * FROM page""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val key = struct(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val cursor = li.select(key.as("k"))
        .orderBy(col("k")).limit(100)
        .agg(max(col("k")).as("c"))
      li.crossJoin(broadcast(cursor))
        .filter(key > col("c"))
        .select(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast("long").as("qty"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .limit(50)
    },

    // ---- C41: systematic importance resampling ------------------------------
    // Importance sampling without an RNG: lay the corpus on a weight
    // line in a deterministic shuffled order (md5 of doc_id), then
    // take one document at every stride = W/100 crossing — the
    // systematic resampler particle filters use, which has lower
    // variance than iid draws and is bit-reproducible on any cluster.
    // The cumulative weight is a TWO-PHASE sharded prefix sum
    // (ShardedRank.withPrefixSum: deterministic shard boundaries from
    // a key sample, local window + broadcast shard offsets) — no
    // unpartitioned window touches the data, no checkpoint needed.
    QueryDef.sql(
      "c41_systematic_resample",
      """WITH h AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
        |    md5(CAST(doc_id AS VARCHAR)) AS ord
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, w,
        |    CAST(sum(w) OVER (ORDER BY ord) AS BIGINT) AS cum,
        |    CAST(sum(w) OVER () AS BIGINT) AS wtot
        |  FROM h),
        |s AS (SELECT *, wtot // 100 AS stride FROM c)
        |SELECT doc_id, w, cum, CAST(cum // stride AS BIGINT) AS pick_idx
        |FROM s WHERE cum // stride > (cum - w) // stride
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val h = Tables.documents(s, d).select(col("doc_id"),
        col("n_chars").cast("long").as("w"),
        md5(col("doc_id").cast("string")).as("ord"))
      val cum = graft.operators.ShardedRank
        .withPrefixSum(h, "__cum", col("w"), col("ord"))
        .withColumn("cum", col("__cum").cast("long")).drop("__cum")
      val wtot = h.agg(sum(col("w")).as("wtot"))
      cum.crossJoin(broadcast(wtot))
        .withColumn("stride", expr("wtot div 100"))
        .filter(expr("cum div stride > (cum - w) div stride"))
        .select(col("doc_id"), col("w"), col("cum"),
          expr("cum div stride").cast("long").as("pick_idx"))
        .orderBy(col("doc_id"))
    },

    // ---- U44: dictionary-encoding planner -----------------------------------
    // The storage-layout decision every columnar writer makes: for each
    // candidate column, compare plain size (Σ value lengths) against a
    // dictionary estimate (⌈log₂ distinct⌉ bits per row + the
    // dictionary itself). Columns fan out via one explode (long-form —
    // N columns cost one scan, not N), sizes are exact integers, and
    // the verdict is an integer permille ratio. ceil(log₂ n) computes
    // portably as length(bin(n−1)).
    QueryDef.sql(
      "u44_dict_encoding_planner",
      """WITH long_form AS (
        |  SELECT 'o_orderstatus' AS col_name, o_orderstatus AS val FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', o_orderpriority FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', CAST(CAST(o_orderdate AS DATE) AS VARCHAR)
        |  FROM orders),
        |stats AS (
        |  SELECT col_name, CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
        |    CAST(sum(length(val)) AS BIGINT) AS plain_bytes
        |  FROM long_form GROUP BY 1),
        |dict AS (
        |  SELECT col_name,
        |    CAST(sum(length(val)) AS BIGINT) AS dict_bytes
        |  FROM (SELECT DISTINCT col_name, val FROM long_form) GROUP BY 1)
        |SELECT s.col_name, s.n, s.n_distinct, s.plain_bytes,
        |  CAST(CASE WHEN s.n_distinct > 1
        |    THEN length(bin(s.n_distinct - 1)) ELSE 1 END AS BIGINT) AS bits_per_val,
        |  CAST((s.n * (CASE WHEN s.n_distinct > 1
        |      THEN length(bin(s.n_distinct - 1)) ELSE 1 END) + 7) // 8
        |    + d.dict_bytes AS BIGINT) AS dict_est_bytes,
        |  CAST(((s.n * (CASE WHEN s.n_distinct > 1
        |      THEN length(bin(s.n_distinct - 1)) ELSE 1 END) + 7) // 8
        |    + d.dict_bytes) * 1000 // s.plain_bytes AS BIGINT) AS ratio_permille
        |FROM stats s JOIN dict d USING (col_name)
        |ORDER BY 1""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val longForm = o.select(explode(array(
          struct(lit("o_orderstatus").as("col_name"),
            col("o_orderstatus").as("val")),
          struct(lit("o_orderpriority").as("col_name"),
            col("o_orderpriority").as("val")),
          struct(lit("o_orderdate").as("col_name"),
            col("o_orderdate").cast("date").cast("string").as("val"))))
          .as("e"))
        .select(col("e.col_name").as("col_name"), col("e.val").as("val"))
        .localCheckpoint(true) // stats and dictionary read one long-form pass
      val stats = longForm.groupBy(col("col_name"))
        .agg(count(lit(1)).as("n"), count_distinct(col("val")).as("n_distinct"),
          sum(length(col("val"))).cast("long").as("plain_bytes"))
      val dict = longForm.select(col("col_name"), col("val")).distinct()
        .groupBy(col("col_name"))
        .agg(sum(length(col("val"))).cast("long").as("dict_bytes"))
      stats.join(dict, "col_name")
        .withColumn("bits_per_val",
          when(col("n_distinct") > 1, length(bin(col("n_distinct") - 1)))
            .otherwise(1).cast("long"))
        .withColumn("dict_est_bytes",
          (expr("(n * bits_per_val + 7) div 8") + col("dict_bytes")).cast("long"))
        .withColumn("ratio_permille",
          expr("dict_est_bytes * 1000 div plain_bytes").cast("long"))
        .select(col("col_name"), col("n"), col("n_distinct"), col("plain_bytes"),
          col("bits_per_val"), col("dict_est_bytes"), col("ratio_permille"))
        .orderBy(col("col_name"))
    }
  )
}
