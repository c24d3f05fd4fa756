package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** The relational operator surface (SURVEY.md §2.1–§2.10) demonstrated
  * over the TESTDATA tables, each with a DuckDB oracle.
  *
  * Query names carry the SURVEY operator id they exercise (s1, p1, e2,
  * r1, j1, a2, u1, ...). The IRS-990-specific realization of the same
  * operators (XML version coalescing, checkbox collapse, explode of
  * repeating groups) lives in [[graft.engine]] and is tested against
  * XML fixtures in the test suite; here the identical Column algebra
  * runs on generic tables so the driver's DuckDB oracle can check it.
  *
  * Scale posture: dimension tables are `broadcast()` so fact-side scans
  * never shuffle for the join; aggregates are partial+final (Spark
  * default); all sums are decimal-exact so results are stable under any
  * partitioning / AQE re-plan.
  */
object RelationalQueries {

  /** Exact, order-independent sum of a double column via decimal. */
  private def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Edit-distance record-linkage pairs over parts (j5's plan, shared
    * with er1): distances over DISTINCT name pairs (banded Levenshtein
    * + length band), row expansion via hash equi-joins — never a
    * row-level cartesian.
    */
  private def fuzzyPartPairs(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"), col("p_name"))
    val names = p.select(col("p_name")).distinct()
    // ordered distance table over distinct names (incl. equal pairs,
    // dist 0) — tiny, broadcast into the expansion joins
    val dist = names.select(col("p_name").as("name_a"))
      .join(names.select(col("p_name").as("name_b")),
        abs(length(col("name_a")) - length(col("name_b"))) <= 2)
      .select(col("name_a"), col("name_b").as("dname_b"),
        levenshtein(col("name_a"), col("name_b"), 2).as("edit_dist"))
      .filter(col("edit_dist") =!= -1)
    val a = p.select(col("p_partkey").as("key_a"), col("p_brand"),
      col("p_name").as("name_a"))
    val b = p.select(col("p_partkey").as("key_b"), col("p_brand").as("brand_b"),
      col("p_name").as("name_b"))
    a.join(broadcast(dist), "name_a")
      .join(b, col("p_brand") === col("brand_b") && col("dname_b") === col("name_b") &&
        col("key_a") < col("key_b"))
      .select(col("key_a"), col("key_b"), col("name_a"), col("name_b"),
        col("edit_dist").cast("int").as("edit_dist"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- A1/A2-style headline aggregation (TPC-H Q1 shape) ----------
    QueryDef.sql(
      "q1_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) * (CAST(1.0 AS DOUBLE) + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val one = lit(1.0)
      li.groupBy(col("l_returnflag"), col("l_linestatus")).agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice") * (one - col("l_discount"))).cast(DecimalType(18, 6))).cast("double").as("sum_disc_price"),
        sum((col("l_extendedprice") * (one - col("l_discount")) * (one + col("l_tax"))).cast(DecimalType(18, 6))).cast("double").as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (sum(col("l_discount").cast(DecimalType(18, 6))).cast("double") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
    },

    // ---- J3 + top-k (TPC-H Q3 shape); broadcast dim, exact revenue --
    QueryDef.sql(
      "q3_shipping_priority",
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      Tables.orders(s, d)
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(18, 6))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // ---- J3 five-way star join + agg (TPC-H Q5 shape) ---------------
    QueryDef.sql(
      "q5_region_revenue",
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d).join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      val sup = Tables.supplier(s, d).join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(DecimalType(18, 6))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---- Q6 shape: selective filter + single agg ---------------------
    QueryDef.sql(
      "q6_forecast_revenue",
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_quantity < 24.0 AND l_discount BETWEEN 0.05 AND 0.07""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") < 24.0 &&
          col("l_discount").between(0.05, 0.07))
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast(DecimalType(18, 6))).cast("double").as("revenue"))
    },

    // ---- Q10 shape: returned-items customer ranking ------------------
    QueryDef.sql(
      "q10_returned_items",
      """SELECT c_custkey, c_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 6))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // ---- S1+R7: index scan with TaxYear derivation ------------------
    // (reference: TaxPeriod → TaxYear, December rule, R:77-84)
    QueryDef.sql(
      "s1_index_scan_taxyear",
      """SELECT o_orderkey, o_orderdate,
        |  CAST(CASE WHEN month(o_orderdate) = 12 THEN year(o_orderdate)
        |            ELSE year(o_orderdate) - 1 END AS INT) AS taxyr
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderdate"),
        when(month(col("o_orderdate")) === 12, year(col("o_orderdate")))
          .otherwise(year(col("o_orderdate")) - 1).cast("int").as("taxyr"))
    },

    // ---- P1/U3: filter + membership predicate (pushed to scan) ------
    QueryDef.sql(
      "p1_filter_isin",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_returnflag IN ('A','R') AND l_quantity > 25.0""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R") && col("l_quantity") > 25.0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_returnflag"))
    },

    // ---- P3/U2: dedup ------------------------------------------------
    QueryDef.sql(
      "p3_index_dedup",
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders") { (s, d) =>
      Tables.orders(s, d).select(col("o_orderstatus"), col("o_orderpriority")).distinct()
    },

    // ---- E2: version coalesce (era-exclusive variants) ---------------
    // (reference: xpath union a|b|c → coalesce, R:332-336)
    QueryDef.sql(
      "e2_version_coalesce",
      """SELECT o_orderkey,
        |  COALESCE(NULLIF(o_orderpriority, '1-URGENT'), o_orderstatus, 'NONE') AS resolved
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")), col("o_orderstatus"), lit("NONE")).as("resolved"))
    },

    // ---- E4: multi-value collapse (FILINGSTATES analogue) ------------
    QueryDef.sql(
      "e4_multivalue_collapse",
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), ' ') AS priorities
        |FROM orders GROUP BY o_custkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(concat_ws(" ", array_sort(collect_set(col("o_orderpriority")))).as("priorities"))
    },

    // ---- E5+R6: checkbox recode + collapse ----------------------------
    // (reference: presence → label, concat_ws collapse, ""→NULL; R:560,618-621)
    QueryDef.sql(
      "e5_checkbox_collapse",
      """SELECT o_orderkey,
        |  NULLIF(concat_ws('', CASE WHEN o_orderstatus = 'O' THEN 'Open' END,
        |                       CASE WHEN o_orderstatus = 'F' THEN 'Finished' END,
        |                       CASE WHEN o_orderstatus = 'P' THEN 'Pending' END), '') AS status_label
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        nullif(concat_ws("",
          when(col("o_orderstatus") === "O", lit("Open")),
          when(col("o_orderstatus") === "F", lit("Finished")),
          when(col("o_orderstatus") === "P", lit("Pending"))), lit("")).as("status_label"))
    },

    // ---- E6: key projection via double regexp_replace ----------------
    // (reference: ObjectId from URL, R:39-44)
    QueryDef.sql(
      "e6_objectid_from_url",
      """SELECT o_orderkey,
        |  regexp_replace(regexp_replace(
        |    'https://s3.amazonaws.com/irs-form-990/' || CAST(o_orderkey AS VARCHAR) || '_public.xml',
        |    '^https://s3\.amazonaws\.com/irs-form-990/', ''), '_public\.xml$', '') AS object_id
        |FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        regexp_replace(regexp_replace(
          concat(lit("https://s3.amazonaws.com/irs-form-990/"), col("o_orderkey").cast("string"), lit("_public.xml")),
          lit("^https://s3\\.amazonaws\\.com/irs-form-990/"), lit("")),
          lit("_public\\.xml$"), lit("")).as("object_id"))
    },

    // ---- R1: zeroALL default after outer join -------------------------
    QueryDef.sql(
      "r1_zero_default",
      """SELECT o_orderkey, COALESCE(c.c_acctbal, CAST(0.0 AS DOUBLE)) AS acctbal_filled
        |FROM orders o LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 9000.0) c
        |  ON o.o_custkey = c.c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000.0)
      Tables.orders(s, d)
        .join(broadcast(c), col("o_custkey") === col("c_custkey"), "left")
        .select(col("o_orderkey"), coalesce(col("c_acctbal"), lit(0.0)).as("acctbal_filled"))
    },

    // ---- R3: conditional source-or-sum --------------------------------
    // (reference: EZ reads one field, PC sums two; R:1032-1043)
    QueryDef.sql(
      "r3_conditional_sum",
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_returnflag = 'A' THEN l_quantity
        |       ELSE l_quantity * l_discount + l_quantity * l_tax END AS derived
        |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_returnflag") === "A", col("l_quantity"))
          .otherwise(col("l_quantity") * col("l_discount") + col("l_quantity") * col("l_tax")).as("derived"))
    },

    // ---- A2: contingency counts (table(FormType, TaxYear) analogue) ---
    QueryDef.sql(
      "a2_crosstab_counts",
      """SELECT event_type, CAST(year(ts) AS INT) AS yr, COUNT(*) AS n
        |FROM events GROUP BY event_type, CAST(year(ts) AS INT)""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"), year(col("ts")).cast("int").as("yr"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- A3: panel-spell histogram (table(table(EIN)) analogue) -------
    QueryDef.sql(
      "a3_panel_histogram",
      """SELECT n_filings, COUNT(*) AS n_customers FROM (
        |  SELECT o_custkey, COUNT(*) AS n_filings FROM orders GROUP BY o_custkey
        |) GROUP BY n_filings""".stripMargin) { (s, d) =>
      Tables.orders(s, d).groupBy(col("o_custkey")).agg(count(lit(1)).as("n_filings"))
        .groupBy(col("n_filings")).agg(count(lit(1)).as("n_customers"))
    },

    // ---- A5: rollup (analytics layer; free via Catalyst, SURVEY §2.6) --
    QueryDef.sql(
      "a5_rollup",
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    },

    // ---- A6: cube ------------------------------------------------------
    QueryDef.sql(
      "a6_cube",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- A7: grouping sets via the SQL entry point ---------------------
    QueryDef.sql(
      "a7_grouping_sets",
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
          |FROM orders_gs GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""".stripMargin)
    },

    // ---- A3b: exact distinct counts ------------------------------------
    QueryDef.sql(
      "a3b_distinct_count",
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d).groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"))
    },

    // ---- A8: HLL sketch distinct (scale path; sketches differ between
    // engines so rows-only — the exact twin above is the oracle story)
    QueryDef.rowsOnly("a8_approx_distinct") { (s, d) =>
      Tables.orders(s, d).groupBy(col("o_orderpriority"))
        .agg(approx_count_distinct(col("o_custkey"), rsd = 0.02).as("n_cust_approx"),
          countDistinct(col("o_custkey")).as("n_cust_exact"))
    },

    // ---- J1: semi join against a key set ------------------------------
    QueryDef.sql(
      "j1_semi_join",
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')""".stripMargin) { (s, d) =>
      val keys = Tables.customer(s, d).filter(col("c_mktsegment") === "MACHINERY").select(col("c_custkey"))
      Tables.orders(s, d)
        .join(broadcast(keys), col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"))
    },

    // ---- J1b: anti join (NOT EXISTS) -----------------------------------
    QueryDef.sql(
      "j1b_anti_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')""".stripMargin) { (s, d) =>
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
      Tables.customer(s, d)
        .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    },

    // ---- J2/G: 1:M parent-key replication via explode -------------------
    // (reference: build_rdb_table — header keys replicated onto each
    //  repeating-group row, R:269-270.) The registered plan explodes an
    //  ALREADY-NESTED parent table — the shape the 990 corpus arrives
    //  in (Return → repeating group array) and what TableBuild.oneToMany
    //  actually runs; no collect_list (memory-unbounded per key) exists
    //  in it. The nested source is staged corpus-prep, sorted inside
    //  each array for determinism; the oracle is the identity
    //  projection, proving explode + key replication round-trips the
    //  child table exactly.
    QueryDef.sql(
      "j2_explode_child_table",
      "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem") { (s, d) =>
      val nestedDir = s"/tmp/graft_j2_nested/${new java.io.File(d).getName}"
      // stage once per source version (Staging.stageOnce): the
      // measured/compared plan is the nested-source explode itself,
      // not the corpus-prep write
      Staging.stageOnce(nestedDir, Staging.sourceKey(d, "lineitem")) {
        Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(sort_array(collect_list(
            struct(col("l_linenumber"), col("l_quantity"), col("l_extendedprice")))).as("items"))
          .write.mode("overwrite").parquet(nestedDir)
      }
      s.read.parquet(nestedDir)
        .select(col("l_orderkey"), explode(col("items")).as("item"))
        .select(col("l_orderkey"), col("item.l_linenumber"), col("item.l_quantity"), col("item.l_extendedprice"))
    },

    // ---- J3: downstream star join on replicated keys --------------------
    QueryDef.sql(
      "j3_star_join",
      """SELECT o_orderkey, c_name, n_name, r_name
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("o_orderkey"), col("c_name"), col("n_name"), col("r_name"))
    },

    // ---- Skew-salted equi-join (operators.SaltedJoin) ------------------
    // The salted physical shape (left salted, right replicated x
    // buckets, join on (key, salt)) must emit EXACTLY the plain join's
    // rows — which is what the plain-SQL oracle asserts bit-for-bit.
    QueryDef.sql(
      "j4_salted_join",
      """SELECT e.event_id, e.user_id, o.n_orders
        |FROM events e
        |JOIN (SELECT o_custkey, COUNT(*) AS n_orders
        |      FROM orders GROUP BY o_custkey) o
        |  ON e.user_id = o.o_custkey""".stripMargin) { (s, d) =>
      val dim = Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
        .select(col("o_custkey").as("user_id"), col("n_orders"))
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"))
      graft.operators.SaltedJoin.innerSalted(ev, dim, key = "user_id",
          buckets = 8, leftSeed = Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("n_orders"))
    },

    // ---- U1: union with schema merge (bind_rows analogue) ---------------
    QueryDef.sql(
      "u1_union_by_name",
      """SELECT o_orderkey AS id, o_totalprice AS amount, 'order' AS src, o_orderpriority AS priority FROM orders
        |UNION ALL BY NAME
        |SELECT c_custkey AS id, 'customer' AS src, c_acctbal AS amount FROM customer""".stripMargin) { (s, d) =>
      val a = Tables.orders(s, d).select(
        col("o_orderkey").as("id"), col("o_totalprice").as("amount"),
        lit("order").as("src"), col("o_orderpriority").as("priority"))
      val b = Tables.customer(s, d).select(
        col("c_custkey").as("id"), lit("customer").as("src"), col("c_acctbal").as("amount"))
      a.unionByName(b, allowMissingColumns = true)
    },

    // ---- U4/U5: intersect / except (beyond the reference's set ops) -----
    QueryDef.sql(
      "u4_intersect",
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        .intersect(o.filter(col("o_orderpriority") === "5-LOW").select(col("o_custkey")))
    },

    QueryDef.sql(
      "u5_except",
      """SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW'""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
        .except(o.filter(col("o_orderpriority") === "5-LOW").select(col("o_custkey")))
    },

    // ---- U6: unpivot / melt (wide → long), the inverse of a9 ------------
    QueryDef.sql(
      "u6_unpivot",
      """SELECT o_orderkey, 'o_totalprice' AS metric,
        |       CAST(o_totalprice AS DOUBLE) AS val FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'o_custkey',
        |       CAST(o_custkey AS DOUBLE) FROM orders""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          col("o_totalprice").cast("double"),
          col("o_custkey").cast("double"))
        .unpivot(Array(col("o_orderkey")), "metric", "val")
    },

    // ---- U7: schema-evolution read (mergeSchema across snapshots) -------
    // The multi-era scan: two parquet snapshots written with different
    // schemas (an old one without `source`) read as ONE table with
    // `mergeSchema` — missing columns surface as typed nulls, exactly
    // how the 990 engine treats era-absent xpaths. Snapshots are
    // staged once per source version (marker-keyed, as j2); the
    // measured plan is the merged scan itself. At 100 TB this is the
    // footer-merge path: schema reconciliation is metadata work, the
    // data is never rewritten.
    QueryDef.sql(
      "u7_merge_schema",
      """SELECT doc_id, lang, CAST(NULL AS VARCHAR) AS source
        |FROM documents WHERE doc_id % 2 = 0
        |UNION ALL
        |SELECT doc_id, lang, source FROM documents WHERE doc_id % 2 = 1""".stripMargin) { (s, d) =>
      val stageDir = s"/tmp/graft_u7_snapshots/${new java.io.File(d).getName}"
      Staging.stageOnce(stageDir, Staging.sourceKey(d, "documents")) {
        val docs = Tables.documents(s, d)
        docs.filter(col("doc_id") % 2 === 0).select(col("doc_id"), col("lang"))
          .write.mode("overwrite").parquet(s"$stageDir/v1")
        docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"), col("lang"), col("source"))
          .write.mode("overwrite").parquet(s"$stageDir/v2")
      }
      s.read.option("mergeSchema", "true")
        .parquet(s"$stageDir/v1", s"$stageDir/v2")
        .select(col("doc_id"), col("lang"), col("source"))
    },

    // ---- A9: pivot to wide format (crosstab as columns) -----------------
    QueryDef.sql(
      "a9_pivot",
      """SELECT o_orderstatus,
        |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS urgent,
        |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS medium,
        |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS low
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", Seq("1-URGENT", "3-MEDIUM", "5-LOW"))
        .agg(count(lit(1)))
        .select(col("o_orderstatus"),
          coalesce(col("1-URGENT"), lit(0L)).as("urgent"),
          coalesce(col("3-MEDIUM"), lit(0L)).as("medium"),
          coalesce(col("5-LOW"), lit(0L)).as("low"))
    },

    // ---- A10: exact percentiles (interpolated median per group) ---------
    QueryDef.sql(
      "a10_percentiles",
      """SELECT o_orderpriority,
        |  quantile_cont(o_totalprice, 0.5) AS p50,
        |  quantile_cont(o_totalprice, 0.9) AS p90
        |FROM orders GROUP BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d).groupBy(col("o_orderpriority"))
        .agg(percentile(col("o_totalprice"), lit(0.5)).as("p50"),
          percentile(col("o_totalprice"), lit(0.9)).as("p90"))
    },

    // ---- W1: window rank (analytics layer; SURVEY §2.10 extension) ------
    QueryDef.sql(
      "w1_window_rank",
      """SELECT * FROM (
        |  SELECT c_mktsegment, c_custkey, spend,
        |    rank() OVER (PARTITION BY c_mktsegment ORDER BY spend DESC, c_custkey) AS rnk
        |  FROM (
        |    SELECT c_mktsegment, c_custkey,
        |      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
        |    FROM customer JOIN orders ON c_custkey = o_custkey
        |    GROUP BY c_mktsegment, c_custkey)
        |) WHERE rnk <= 3""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val spend = Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_mktsegment"), col("c_custkey"))
        .agg(dsum(col("o_totalprice")).as("spend"))
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("spend").desc, col("c_custkey"))
      spend.withColumn("rnk", rank().over(w)).filter(col("rnk") <= 3)
    },

    // ---- W2: running total (deterministic ROWS frame) --------------------
    QueryDef.sql(
      "w2_running_total",
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double").as("running_value"))
    },

    // ---- W3: lag/lead/ntile window family --------------------------------
    QueryDef.sql(
      "w3_lag_lead_ntile",
      """SELECT event_id, user_id,
        |  lag(value) OVER w AS prev_value,
        |  lead(value) OVER w AS next_value,
        |  CAST(ntile(4) OVER w AS INT) AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        ntile(4).over(w).cast("int").as("quartile"))
    },

    // ---- W4: time-RANGE window frame (rolling last-hour aggregate) -------
    // RANGE frames bound by a time delta, not a row count — the "value
    // in the trailing hour" ops metric. Ordering key is epoch
    // milliseconds as BIGINT (unix_millis / epoch_ms agree exactly;
    // epoch() would be a DOUBLE with sub-ms fractions and fragile
    // boundary comparisons). One shuffle on the partition key; the
    // frame is evaluated by a sliding aggregate over each partition —
    // linear, never quadratic in rows-per-user.
    QueryDef.sql(
      "w4_range_frame",
      """SELECT event_id, user_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_last_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
        |  RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW)""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(unix_millis(col("ts")))
        .rangeBetween(-3600000L, 0L)
      Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_last_hour"),
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double").as("sum_last_hour"))
    },

    // ---- Streaming-shaped batch: tumbling-window agg ----------------------
    // (Batch twin of graft.streaming's windowed aggregation.)
    QueryDef.sql(
      "ev1_hourly_rollup",
      """SELECT date_trunc('hour', ts) AS hour_bucket, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
    },

    // ---- Streaming-shaped batch: hopping(sliding)-window agg --------------
    // (Batch twin of EventStreams.hoppingRollup.) Every event lands in
    // duration/slide = 2 overlapping windows — the alert/trend shape
    // tumbling windows can't express (a spike straddling an hour
    // boundary). Spark's window() generator expands rows BEFORE the
    // partial aggregate, so the plan stays one partial+final shuffle;
    // the oracle enumerates the same 30-minute-grid window starts with
    // integer µs arithmetic (no float epoch).
    QueryDef.sql(
      "ev9_hopping_rollup",
      """WITH x AS (
        |  SELECT e.event_type, e.value,
        |    make_timestamp((epoch_us(e.ts) // 1800000000 - i.i) * 1800000000)
        |      AS win_start
        |  FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS i) i)
        |SELECT win_start,
        |  win_start + INTERVAL 1 HOUR AS win_end,
        |  event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM x GROUP BY win_start, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
        .select(col("w.start").as("win_start"), col("w.end").as("win_end"),
          col("event_type"), col("n"), col("total_value"))
    },

    // ---- Sessionization (batch twin of streaming flatMapGroupsWithState) --
    QueryDef.sql(
      "ev2_sessionize",
      """WITH lagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800
        |                 THEN 1 ELSE 0 END AS new_session FROM lagged),
        |numbered AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM flagged)
        |SELECT user_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start, MAX(ts) AS session_end,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM numbered GROUP BY user_id, session_seq""".stripMargin) { (s, d) =>
      graft.streaming.EventStreams.sessionizeBatch(Tables.events(s, d), gapMinutes = 30)
    },

    // ---- Native session windows (the built-in gap-merge operator) --------
    // ev2 sessionizes with CUSTOM state (flatMapGroupsWithState, floor-
    // second gap rule); this is Spark's BUILT-IN session_window — gap
    // merge at exact microsecond precision, batch and streaming from
    // the same expression. Sessions MERGE when the new event's window
    // start <= the current session end (UpdatingSessionsIterator opens
    // a new session only when start > end), so: new session iff
    // ts > last + 30 min (µs) — an event landing EXACTLY on the gap
    // boundary still merges. Session end = last event + gap by
    // definition. The oracle mirrors both rules with strict integer-µs
    // arithmetic; SessionBoundarySpec pins the exact-gap case.
    QueryDef.sql(
      "ev12_session_window",
      """WITH lagged AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
        |    THEN 1 ELSE 0 END AS new_session FROM lagged),
        |numbered AS (
        |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS session_seq FROM flagged)
        |SELECT user_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start,
        |  MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM numbered GROUP BY user_id, session_seq""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("total_value"))
        .select(col("user_id"), col("n_events"),
          col("w.start").as("session_start"), col("w.end").as("session_end"),
          col("total_value"))
    },

    // ---- As-of join (training-pipeline/time-series operator) -----------
    // Spark plan: union + window (one shuffle, O(1) state per key);
    // oracle: DuckDB's native ASOF LEFT JOIN over the same pre-agg.
    QueryDef.sql(
      "ev3_asof_join",
      """WITH ord AS (
        |  SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ot,
        |         MAX(o_orderkey) AS last_orderkey
        |  FROM orders GROUP BY o_custkey, CAST(o_orderdate AS TIMESTAMP))
        |SELECT e.event_id, e.user_id, o.last_orderkey
        |FROM events e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.ot""".stripMargin) { (s, d) =>
      val ord = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate").cast("timestamp").as("ot"))
        .agg(max(col("o_orderkey")).as("last_orderkey"))
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsofJoin.asofLeft(ev, ord,
          leftKey = "user_id", leftTime = "ts",
          rightKey = "o_custkey", rightTime = "ot",
          payload = Seq("last_orderkey"))
        .select(col("event_id"), col("user_id"), col("last_orderkey"))
    },

    // ---- FORWARD as-of join (next event at-or-after) ---------------------
    // The mirrored direction of ev3: each event looks up the NEXT order
    // its user places (schedule/forecast lookups). Same union+window
    // shape with the frame reversed; oracle is DuckDB's native ASOF
    // with the <= inequality.
    QueryDef.sql(
      "ev14_asof_forward",
      """WITH ord AS (
        |  SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS ot,
        |         MAX(o_orderkey) AS last_orderkey
        |  FROM orders GROUP BY o_custkey, CAST(o_orderdate AS TIMESTAMP))
        |SELECT e.event_id, e.user_id, o.last_orderkey AS next_orderkey
        |FROM events e ASOF LEFT JOIN ord o
        |  ON e.user_id = o.o_custkey AND e.ts <= o.ot""".stripMargin) { (s, d) =>
      val ord = Tables.orders(s, d)
        .groupBy(col("o_custkey"), col("o_orderdate").cast("timestamp").as("ot"))
        .agg(max(col("o_orderkey")).as("last_orderkey"))
      val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.AsofJoin.asofForward(ev, ord,
          leftKey = "user_id", leftTime = "ts",
          rightKey = "o_custkey", rightTime = "ot",
          payload = Seq("last_orderkey"))
        .select(col("event_id"), col("user_id"),
          col("last_orderkey").as("next_orderkey"))
    },

    // ---- Range (point-in-interval) join: clicks inside error windows ------
    // Spark plan: bucketized equi-join (operators.RangeJoin) — every
    // interval explodes to its covered fixed-width buckets, points map
    // to one bucket, one shuffle on (user_id, bucket) + exact filter.
    // The naive theta join would plan as a nested loop. Oracle is the
    // plain range-predicate join.
    QueryDef.sql(
      "ev4_range_join",
      """WITH err AS (
        |  SELECT user_id, event_id AS err_id, ts AS lo
        |  FROM events WHERE event_type = 'error'),
        |clk AS (
        |  SELECT user_id, event_id AS click_id, ts
        |  FROM events WHERE event_type = 'click')
        |SELECT c.user_id, c.click_id, e.err_id
        |FROM clk c JOIN err e
        |  ON c.user_id = e.user_id
        | AND c.ts >= e.lo AND c.ts < e.lo + INTERVAL 4 HOUR""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val windowUs = 4L * 3600 * 1000000
      val err = ev.filter(col("event_type") === "error").select(
        col("user_id"), col("event_id").as("err_id"),
        unix_micros(col("ts")).as("lo_us"),
        (unix_micros(col("ts")) + windowUs).as("hi_us"))
      val clk = ev.filter(col("event_type") === "click").select(
        col("user_id"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("p_us"))
      graft.operators.RangeJoin.pointInInterval(clk, err, Seq("user_id"),
          "p_us", "lo_us", "hi_us", bucketWidth = windowUs)
        .select(col("user_id"), col("click_id"), col("err_id"))
    },

    // ---- Ordered funnel (view → click → purchase per user) ----------------
    // Event-sequence analytics: each stage's timestamp is the FIRST
    // qualifying event strictly after the previous stage — the ordered
    // funnel, not mere set membership. Scale shape: three user-keyed
    // partial-aggregated reductions; each stage joins the previous
    // stage's one-row-per-user table back onto the event stream on the
    // same user_id key, so co-partitioning is reused and nothing is
    // ever ordered globally. NULLs mean the user fell out of the funnel.
    QueryDef.sql(
      "ev6_funnel",
      """WITH v AS (
        |  SELECT user_id, min(ts) AS view_ts
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |c AS (
        |  SELECT e.user_id, min(ts) AS click_ts
        |  FROM events e JOIN v USING (user_id)
        |  WHERE event_type = 'click' AND ts > view_ts GROUP BY e.user_id),
        |p AS (
        |  SELECT e.user_id, min(ts) AS purchase_ts
        |  FROM events e JOIN c USING (user_id)
        |  WHERE event_type = 'purchase' AND ts > click_ts GROUP BY e.user_id)
        |SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("view_ts"))
      val c = ev.filter(col("event_type") === "click")
        .join(v, "user_id").filter(col("ts") > col("view_ts"))
        .groupBy("user_id").agg(min(col("ts")).as("click_ts"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(c, "user_id").filter(col("ts") > col("click_ts"))
        .groupBy("user_id").agg(min(col("ts")).as("purchase_ts"))
      v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
        .select(col("user_id"), col("view_ts"), col("click_ts"), col("purchase_ts"))
    },

    // ---- Cohort retention matrix -------------------------------------------
    // Users cohorted by first-activity day; each cell counts the
    // cohort's distinct users active N days later. Scale shape: the
    // first-seen table is a user-keyed partial-agg; distinct activity
    // days are a partial-agg over (user, day); the join is on user_id
    // (broadcast under AQE when the cohort table is small) and the
    // final rollup is one partial+final aggregate. Integer day math —
    // no floats anywhere.
    QueryDef.sql(
      "ev7_cohort_retention",
      """WITH f AS (
        |  SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS cohort_day
        |  FROM events GROUP BY user_id),
        |a AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS active_day
        |  FROM events)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, active_day) AS INT) AS day_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM a JOIN f USING (user_id)
        |GROUP BY cohort_day, day_offset""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val f = ev.groupBy("user_id")
        .agg(min(date_trunc("day", col("ts"))).cast("date").as("cohort_day"))
      val a = ev.select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("active_day"))
        .distinct()
      a.join(f, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("active_day"), col("cohort_day")).cast("int").as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
    },

    // ---- Scalar function family (SURVEY §2.9) ------------------------------
    QueryDef.sql(
      "f1_string_funcs",
      """SELECT p_partkey,
        |  upper(p_type) AS type_upper,
        |  substring(p_name, 1, 5) AS name_prefix,
        |  concat_ws('-', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  replace(p_brand, '#', '_') AS brand_clean
        |FROM part""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_type")).as("type_upper"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        concat_ws("-", col("p_brand"), col("p_size").cast("string")).as("brand_size"),
        length(col("p_name")).cast("int").as("name_len"),
        regexp_replace(col("p_brand"), lit("#"), lit("_")).as("brand_clean"))
    },

    QueryDef.sql(
      "f2_datetime_funcs",
      """SELECT event_id,
        |  CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
        |  CAST(day(ts) AS INT) AS dom, CAST(hour(ts) AS INT) AS h,
        |  date_trunc('day', ts) AS day_bucket
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        year(col("ts")).cast("int").as("y"), month(col("ts")).cast("int").as("m"),
        dayofmonth(col("ts")).cast("int").as("dom"), hour(col("ts")).cast("int").as("h"),
        date_trunc("day", col("ts")).as("day_bucket"))
    },

    // ---- JSON scalar extraction (S1 index JSON analogue) -------------------
    QueryDef.sql(
      "f3_json_extract",
      """SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
        |FROM events""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    },

    // ---- equal-width histogram (distribution profiling) --------------------
    // Binning for numeric profiling: 20 equal-width bins over the
    // global [min,max]. The range is a 1-row aggregate broadcast onto
    // the scan; bin math is identical-op-order double arithmetic so
    // both engines agree on every boundary; least(...,19) folds x=max
    // into the top bin. One partial+final count aggregate.
    QueryDef.sql(
      "a13_histogram",
      """WITH mm AS (SELECT min(value) AS mn, max(value) AS mx FROM events)
        |SELECT CASE WHEN mx > mn
        |            THEN CAST(least(floor((value - mn) / ((mx - mn) / 20.0)), 19.0) AS INT)
        |            ELSE 0 END AS bin,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM events CROSS JOIN mm
        |GROUP BY bin""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val mm = ev.agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      // mx == mn guard: a constant column would otherwise reach an
      // ANSI-throwing CAST(NaN AS INT) in both engines
      ev.crossJoin(broadcast(mm))
        .select(when(col("mx") > col("mn"),
            least(floor((col("value") - col("mn")) /
              ((col("mx") - col("mn")) / lit(20.0))), lit(19.0)).cast("int"))
          .otherwise(0).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
    },

    // ---- event transition matrix (next-event analysis) ---------------------
    // Markov-style path analytics: count (event_type → next event_type)
    // transitions per user stream. One user-keyed shuffle for the lead
    // window, then a partial+final count aggregate over the 5×5 matrix.
    QueryDef.sql(
      "ev8_transitions",
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS next_type
        |  FROM events)
        |SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
        |FROM seq WHERE next_type IS NOT NULL
        |GROUP BY event_type, next_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_type"), lead(col("event_type"), 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
    },

    // ---- CDC merge / upsert (MERGE INTO semantics in batch) ----------------
    // The standard change-data-capture apply: a deterministic changes
    // table (deletes, updates, inserts derived from the key space) is
    // merged into the base — op 'D' drops the row, 'U' overwrites the
    // payload, 'I' adds a new key. Scale shape: ONE full-outer hash
    // join on the primary key (at a lakehouse this is the
    // copy-on-write MERGE plan; merge-on-read would defer this join to
    // scan time); the changes side is usually small → broadcast under
    // AQE. Price math goes through decimal so the update is bit-exact.
    QueryDef.sql(
      "u8_merge_upsert",
      """WITH chg AS (
        |  SELECT o_orderkey AS k, 'D' AS op, CAST(NULL AS DOUBLE) AS new_price
        |  FROM orders WHERE o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT o_orderkey, 'U',
        |    CAST(CAST(o_totalprice AS DECIMAL(18,4)) * CAST(1.1 AS DECIMAL(3,1)) AS DOUBLE)
        |  FROM orders WHERE o_orderkey % 97 = 1
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, 'I', o_totalprice
        |  FROM orders WHERE o_orderkey % 97 = 2)
        |SELECT
        |  coalesce(b.o_orderkey, c.k) AS o_orderkey,
        |  CASE WHEN c.op = 'U' OR c.op = 'I' THEN c.new_price ELSE b.o_totalprice END
        |    AS o_totalprice,
        |  CASE WHEN c.op IS NULL THEN 'base'
        |       WHEN c.op = 'U' THEN 'updated' ELSE 'inserted' END AS merge_src
        |FROM orders b FULL OUTER JOIN chg c ON b.o_orderkey = c.k
        |WHERE c.op IS NULL OR c.op <> 'D'""".stripMargin) { (s, d) =>
      val base = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      val chg = base.filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey").as("k"), lit("D").as("op"),
          lit(null).cast("double").as("new_price"))
        .unionAll(base.filter(col("o_orderkey") % 97 === 1)
          .select(col("o_orderkey").as("k"), lit("U").as("op"),
            (col("o_totalprice").cast(DecimalType(18, 4)) *
              lit(BigDecimal("1.1")).cast(DecimalType(3, 1))).cast("double").as("new_price")))
        .unionAll(base.filter(col("o_orderkey") % 97 === 2)
          .select((col("o_orderkey") + 100000000L).as("k"), lit("I").as("op"),
            col("o_totalprice").as("new_price")))
      base.join(chg, col("o_orderkey") === col("k"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(
          coalesce(col("o_orderkey"), col("k")).as("o_orderkey"),
          when(col("op") === "U" || col("op") === "I", col("new_price"))
            .otherwise(col("o_totalprice")).as("o_totalprice"),
          when(col("op").isNull, "base")
            .when(col("op") === "U", "updated").otherwise("inserted").as("merge_src"))
    },

    // ---- data-quality check suite (constraint audit) -----------------------
    // The validation pass every production pipeline runs before
    // publishing: referential integrity (anti joins — broadcast when
    // the parent side is small), primary-key uniqueness (count>1
    // aggregate), domain-range and non-null checks (scan-stage
    // filters). One row per check; n_violations = 0 means the
    // constraint holds. Each check is an independent bounded job —
    // at 100 TB they share the scans via cache or run as one
    // multi-aggregate pass.
    QueryDef.sql(
      "a11_dq_checks",
      """SELECT 'orders_custkey_fk' AS check_name, CAST(count(*) AS BIGINT) AS n_violations
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_custkey IS NULL
        |UNION ALL
        |SELECT 'lineitem_orderkey_fk', CAST(count(*) AS BIGINT)
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IS NULL
        |UNION ALL
        |SELECT 'orders_pk_unique', CAST(count(*) AS BIGINT)
        |FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
        |UNION ALL
        |SELECT 'orders_price_positive', CAST(count(*) AS BIGINT)
        |FROM orders WHERE o_totalprice <= 0.0
        |UNION ALL
        |SELECT 'customer_name_nonnull', CAST(count(*) AS BIGINT)
        |FROM customer WHERE c_name IS NULL""".stripMargin) { (s, d) =>
      def check(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_violations")).select(lit(name).as("check_name"),
          col("n_violations"))
      val orders = Tables.orders(s, d)
      val customer = Tables.customer(s, d)
      check("orders_custkey_fk",
          orders.join(broadcast(customer), col("o_custkey") === col("c_custkey"), "left_anti"))
        .unionAll(check("lineitem_orderkey_fk",
          Tables.lineitem(s, d).join(orders, col("l_orderkey") === col("o_orderkey"), "left_anti")))
        .unionAll(check("orders_pk_unique",
          orders.groupBy("o_orderkey").agg(count(lit(1)).as("n")).filter(col("n") > 1)))
        .unionAll(check("orders_price_positive", orders.filter(col("o_totalprice") <= 0.0)))
        .unionAll(check("customer_name_nonnull", customer.filter(col("c_name").isNull)))
    },

    // ---- fuzzy join (blocked edit-distance record linkage) -----------------
    // The classic entity-resolution join: match near-identical names
    // (typos, pluralization) without an all-pairs compare. Scale shape:
    // the expensive part (Levenshtein) runs on DISTINCT VALUE PAIRS,
    // not row pairs — real corpora repeat names heavily, so the
    // distance table is |V|² bounded by a length band (|len(a)-len(b)|
    // <= d is a necessary condition for distance <= d) and the
    // threshold form of levenshtein (banded DP, early exit). Row
    // expansion is then two hash equi-joins on (brand, name) —
    // output-bounded, never a nested loop over rows. A naive row-pair
    // formulation measured 14.5 s at sf0.1; this shape is ~25× less
    // Levenshtein work (13M row pairs → |V|²=4k value pairs).
    // Levenshtein (unit-cost insert/delete/substitute) is bit-identical
    // between Spark and DuckDB, so the oracle is exact.
    QueryDef.sql(
      "j5_fuzzy_join",
      """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        |  a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS edit_dist
        |FROM part a JOIN part b
        |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |  AND abs(len(a.p_name) - len(b.p_name)) <= 2
        |WHERE levenshtein(a.p_name, b.p_name) <= 2""".stripMargin) { (s, d) =>
      fuzzyPartPairs(s, d)
    },

    // ---- A14: key-skew audit (the input to a salting decision) ----------
    // Profiles the shuffle-key distribution BEFORE a big join/agg: per
    // hot key its row count and corpus share, plus how many stripes a
    // skew-salting pass (j4) would need to flatten it to the mean
    // partition load. One partial-aggregated groupBy (hot keys
    // pre-combine map-side) + a 1-row global aggregate broadcast onto
    // the report; top-20 ships through TakeOrdered, never a full sort.
    QueryDef.sql(
      "a14_skew_audit",
      """WITH k AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY user_id),
        |g AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS total,
        |    CAST(count(*) AS BIGINT) AS n_keys
        |  FROM k)
        |SELECT k.user_id, k.n,
        |  round(CAST(k.n AS DOUBLE) / CAST(g.total AS DOUBLE), 6) AS share,
        |  CAST(ceil(CAST(k.n AS DOUBLE)
        |    / (CAST(g.total AS DOUBLE) / CAST(g.n_keys AS DOUBLE))) AS BIGINT)
        |    AS salt_stripes
        |FROM k CROSS JOIN g
        |ORDER BY k.n DESC, k.user_id LIMIT 20""".stripMargin) { (s, d) =>
      val k = Tables.events(s, d).groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      val g = k.agg(sum(col("n")).as("total"), count(lit(1)).as("n_keys"))
      k.crossJoin(broadcast(g))
        .select(col("user_id"), col("n"),
          round(col("n").cast("double") / col("total").cast("double"), 6).as("share"),
          ceil(col("n").cast("double") /
            (col("total").cast("double") / col("n_keys").cast("double")))
            .cast("bigint").as("salt_stripes"))
        .orderBy(col("n").desc, col("user_id")).limit(20)
    },

    // ---- A15: z-score outlier detection (exact-moment anomaly flag) ------
    // Per-segment mean/std from DECIMAL-EXACT first and second moments
    // (sum and sum-of-squares are order-independent in decimal, so the
    // moments are reproducible under any partitioning — the same
    // discipline as every dsum in this file), then a broadcast of the
    // tiny per-type stats row back onto the scan flags |z| > 3. The
    // per-row double product v*v is IEEE-deterministic; only the final
    // z is rounded (6 dp) to absorb sqrt's 1-ulp libm risk.
    QueryDef.sql(
      "a15_zscore_outliers",
      """WITH st AS (
        |  SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - s1 / n)
        |    / sqrt(s2 / n - (s1 / n) * (s1 / n)), 6) AS z
        |FROM events e JOIN st ON e.event_type = st.event_type
        |WHERE s2 / n - (s1 / n) * (s1 / n) > 0
        |  AND abs((e.value - s1 / n)
        |    / sqrt(s2 / n - (s1 / n) * (s1 / n))) > 3""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val st = Tables.events(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("s1"),
          sum((col("value") * col("value")).cast(DecimalType(30, 6))).cast("double").as("s2"))
      val mean = col("s1") / col("n")
      val variance = col("s2") / col("n") - mean * mean
      val z = (col("value") - mean) / sqrt(variance)
      // zero-variance guard: x/0 is NULL in Spark, ±inf in DuckDB's
      // IEEE mode — the same predicate excludes the segment in both
      Tables.events(s, d).join(broadcast(st), "event_type")
        .filter(variance > 0 && abs(z) > 3)
        .select(col("event_id"), col("event_type"), col("value"), round(z, 6).as("z"))
    },

    // ---- A16: grouped Pearson correlation (exact-moment) -----------------
    // corr(document length, distinct-token count) per language — the
    // length-vs-vocabulary curve every corpus profile reports. Inputs
    // are INTEGERS, so all five moments accumulate exactly in DECIMAL
    // (order-independent under any partitioning); the final correlation
    // is a fixed-op-order double expression rounded to 6 (sqrt ulp).
    // One partial-aggregated shuffle over ≤ #languages groups — the
    // scale shape of every sufficient-statistics computation.
    QueryDef.sql(
      "a16_grouped_corr",
      """WITH f AS (
        |  SELECT lang,
        |    CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS x,
        |    CAST(len(list_distinct(regexp_extract_all(lower(text), '\S+'))) AS BIGINT) AS y
        |  FROM documents),
        |m AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(y * y) AS DOUBLE) AS syy
        |  FROM f GROUP BY lang)
        |SELECT lang, n,
        |  round((n * sxy - sx * sy)
        |    / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_len_vocab
        |FROM m
        |WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val f = Tables.documents(s, d).select(col("lang"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("x"),
        size(array_distinct(graft.functions.TextFunctions.tokens(col("text")))).cast("long").as("y"))
      val m = f.groupBy("lang").agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(DecimalType(38, 0))).cast("double").as("sx"),
        sum(col("y").cast(DecimalType(38, 0))).cast("double").as("sy"),
        sum((col("x") * col("y")).cast(DecimalType(38, 0))).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast(DecimalType(38, 0))).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast(DecimalType(38, 0))).cast("double").as("syy"))
      val n = col("n").cast("double")
      // degenerate-group guard (n=1 or a constant feature): 0/0 is NULL
      // in Spark but NaN in DuckDB's IEEE mode — exclude in BOTH engines
      m.filter(n * col("sxx") - col("sx") * col("sx") > 0 &&
          n * col("syy") - col("sy") * col("sy") > 0)
        .select(col("lang"), col("n"),
        round((n * col("sxy") - col("sx") * col("sy")) /
          (sqrt(n * col("sxx") - col("sx") * col("sx")) *
            sqrt(n * col("syy") - col("sy") * col("sy"))), 6).as("corr_len_vocab"))
    },

    // ---- A17: grouped OLS regression (sufficient statistics) -------------
    // Per-group simple linear regression y = slope·x + intercept with
    // fit quality r² — the per-segment trend fit behind every
    // drift/calibration dashboard (here: price vs quantity per return
    // flag). Same exact-moment discipline as a16: x is integral, y is
    // a 2-dp price, so all five moments accumulate exactly in DECIMAL
    // (order-independent under any partitioning); slope, intercept and
    // r² are straight-line double expressions over the moments, rounded
    // to 6. ONE partial-aggregated shuffle over ≤ #flags groups — the
    // canonical sufficient-statistics scale shape (the 100 TB plan is
    // identical: map-side partials, 3-row final).
    QueryDef.sql(
      "a17_grouped_regression",
      """WITH f AS (
        |  SELECT l_returnflag,
        |    CAST(l_quantity AS BIGINT) AS x,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        |  FROM lineitem),
        |m AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx,
        |    CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x * y AS DECIMAL(38,2))) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(y * y AS DECIMAL(38,4))) AS DOUBLE) AS syy
        |  FROM f GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
        |    AS intercept,
        |  round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
        |    / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM m
        |WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0""".stripMargin) { (s, d) =>
      val f = Tables.lineitem(s, d).select(col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("y"))
      val m = f.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum((col("x") * col("y")).cast(DecimalType(38, 2))).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum((col("y") * col("y")).cast(DecimalType(38, 4))).cast("double").as("syy"))
      val n = col("n").cast("double")
      val sxy = n * col("sxy") - col("sx") * col("sy")
      val sxx = n * col("sxx") - col("sx") * col("sx")
      val syy = n * col("syy") - col("sy") * col("sy")
      m.filter(sxx > 0 && syy > 0)
        .select(col("l_returnflag"), col("n"),
          round(sxy / sxx, 6).as("slope"),
          round((col("sy") - (sxy / sxx) * col("sx")) / n, 6).as("intercept"),
          round((sxy * sxy) / (sxx * syy), 6).as("r2"))
    },

    // ---- A18: co-purchase graph triangles + clustering coefficient -------
    // Market-basket graph analytics: parts are nodes, an edge means
    // "co-occurred in ≥ 2 orders" (per-order pair generation is bounded
    // by basket size — C(7,2) rows/order, linear — and the support
    // floor prunes before any graph work). Triangles are counted with
    // DEGREE-ORDERED ORIENTATION: every edge points from its
    // (deg, id)-smaller endpoint, wedges are enumerated only at each
    // triangle's ≺-minimum vertex, and the closing edge is probed in
    // that same canonical direction — candidate wedges are bounded by
    // Σ deg_out², the arboricity bound that keeps hub nodes from
    // exploding the join (the naive all-orders wedge join is Σ deg²).
    // The oracle counts the SAME triangle set via the naive a<b<c
    // 3-way self-join — orientation is a physical choice, invisible in
    // the result. Per-node clustering coefficient = 2T/deg(deg−1),
    // fixed op order, round 6.
    QueryDef.sql(
      "a18_triangle_count",
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS (
        |  SELECT a.l_partkey AS id_a, b.l_partkey AS id_b
        |  FROM op a JOIN op b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS deg
        |  FROM (SELECT id_a AS id FROM p UNION ALL SELECT id_b FROM p)
        |  GROUP BY id),
        |tri AS (
        |  SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z
        |  FROM p e1 JOIN p e2 ON e1.id_b = e2.id_a
        |  JOIN p e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
        |tn AS (
        |  SELECT id, CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM (SELECT x AS id FROM tri
        |        UNION ALL SELECT y FROM tri
        |        UNION ALL SELECT z FROM tri)
        |  GROUP BY id)
        |SELECT d.id AS part_id, d.deg,
        |  coalesce(tn.n_triangles, 0) AS n_triangles,
        |  CASE WHEN d.deg >= 2 THEN
        |    round(CAST(2 * coalesce(tn.n_triangles, 0) AS DOUBLE)
        |      / CAST(d.deg * (d.deg - 1) AS DOUBLE), 6)
        |  ELSE CAST(0.0 AS DOUBLE) END AS clustering_coeff
        |FROM deg d LEFT JOIN tn ON d.id = tn.id""".stripMargin) { (s, d) =>
      // r6 opt: aggregate-before-join pair build (PairGraph) — one
      // exchange on the order key + pair explode instead of distinct +
      // self-join (4 exchanges + SMJ); same (order, pair) multiset.
      val p = graft.operators.PairGraph.groupPairs(
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey")
        .groupBy(col("src").as("id_a"), col("dst").as("id_b"))
        .agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2)
        .select("id_a", "id_b")
      // node table ≪ edge list → broadcast degrees (d6/d7's trade)
      val deg = p.select(col("id_a").as("id")).unionAll(p.select(col("id_b").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
      val e = p
        .join(broadcast(deg.select(col("id").as("id_a"), col("deg").as("deg_a"))), "id_a")
        .join(broadcast(deg.select(col("id").as("id_b"), col("deg").as("deg_b"))), "id_b")
      val aFirst = struct(col("deg_a"), col("id_a")) < struct(col("deg_b"), col("id_b"))
      val o = e.select(
        when(aFirst, col("id_a")).otherwise(col("id_b")).as("src"),
        when(aFirst, col("id_b")).otherwise(col("id_a")).as("dst"),
        when(aFirst, struct(col("deg_b").as("deg"), col("id_b").as("id")))
          .otherwise(struct(col("deg_a").as("deg"), col("id_a").as("id"))).as("dst_key"))
      val o1 = o.select(col("src"), col("dst").as("x"), col("dst_key").as("xk"))
      val o2 = o.select(col("src"), col("dst").as("y"), col("dst_key").as("yk"))
      val wedges = o1.join(o2, "src").filter(col("xk") < col("yk"))
        .select(col("src"), col("x"), col("y"))
      val closing = o.select(col("src").as("x"), col("dst").as("y"))
      val tri = wedges.join(closing, Seq("x", "y"))
      val tn = tri.select(col("src").as("id"))
        .unionAll(tri.select(col("x").as("id")))
        .unionAll(tri.select(col("y").as("id")))
        .groupBy("id").agg(count(lit(1)).as("n_triangles"))
      deg.join(tn, Seq("id"), "left")
        .select(col("id").as("part_id"), col("deg"),
          coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
          when(col("deg") >= 2,
            round((coalesce(col("n_triangles"), lit(0L)) * 2).cast("double") /
              (col("deg") * (col("deg") - 1)).cast("double"), 6))
            .otherwise(lit(0.0)).as("clustering_coeff"))
    },

    // ---- A19: market-basket association rules (support/confidence/lift) --
    // The classic co-occurrence miner over the same bounded pair space
    // as a18: per-order pair generation is C(basket,2) rows — linear in
    // orders — and the support≥2 floor prunes before any rule math.
    // Each surviving unordered pair emits BOTH directional rules
    // ant→cons; confidence = co/cnt(ant), lift = co·N/(cnt(ant)·cnt(cons)).
    // Item counts are a tiny per-part table → broadcast back onto the
    // pair stream (twice); the corpus total N ships as a one-row
    // broadcast. All ratios are one bigint-exact product each side of a
    // single double division, round 6 — bit-identical cross-engine.
    QueryDef.sql(
      "a19_assoc_rules",
      """WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM op),
        |item AS (
        |  SELECT l_partkey AS id, CAST(count(*) AS BIGINT) AS cnt
        |  FROM op GROUP BY 1),
        |pr AS (
        |  SELECT a.l_partkey AS id_a, b.l_partkey AS id_b,
        |    CAST(count(*) AS BIGINT) AS co
        |  FROM op a JOIN op b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |dir AS (
        |  SELECT id_a AS ant, id_b AS cons, co FROM pr
        |  UNION ALL
        |  SELECT id_b AS ant, id_a AS cons, co FROM pr)
        |SELECT d.ant, d.cons, d.co AS support,
        |  round(CAST(d.co AS DOUBLE) / CAST(ia.cnt AS DOUBLE), 6) AS confidence,
        |  round(CAST(d.co * n.n_orders AS DOUBLE)
        |    / CAST(ia.cnt * ic.cnt AS DOUBLE), 6) AS lift
        |FROM dir d
        |JOIN item ia ON d.ant = ia.id
        |JOIN item ic ON d.cons = ic.id
        |CROSS JOIN n""".stripMargin) { (s, d) =>
      val op = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val n = op.agg(countDistinct(col("l_orderkey")).as("n_orders"))
      val item = op.groupBy(col("l_partkey").as("id"))
        .agg(count(lit(1)).as("cnt"))
      // r6 opt: aggregate-before-join pair build (PairGraph, see a18)
      val pr = graft.operators.PairGraph.groupPairs(
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
          "l_orderkey", "l_partkey")
        .groupBy(col("src").as("id_a"), col("dst").as("id_b"))
        .agg(count(lit(1)).as("co"))
        .filter(col("co") >= 2)
      val dir = pr.select(col("id_a").as("ant"), col("id_b").as("cons"), col("co"))
        .unionAll(pr.select(col("id_b").as("ant"), col("id_a").as("cons"), col("co")))
      dir
        .join(broadcast(item.select(col("id").as("ant"), col("cnt").as("cnt_a"))), "ant")
        .join(broadcast(item.select(col("id").as("cons"), col("cnt").as("cnt_c"))), "cons")
        .crossJoin(broadcast(n))
        .select(col("ant"), col("cons"), col("co").as("support"),
          round(col("co").cast("double") / col("cnt_a").cast("double"), 6)
            .as("confidence"),
          round((col("co") * col("n_orders")).cast("double") /
            (col("cnt_a") * col("cnt_c")).cast("double"), 6).as("lift"))
    },

    // ---- W5: winsorization (percentile clipping before training) ---------
    // Feature-prep: clip each segment's values into its [p05, p95] so
    // heavy tails don't dominate a loss. Exact interpolated percentiles
    // (a10's bit-exact `percentile` ≡ quantile_cont equivalence)
    // computed once per segment, broadcast back onto the scan; the clip
    // itself is pure scan-stage least/greatest algebra. Counts are
    // integers (exact); the clipped sum goes through DECIMAL.
    QueryDef.sql(
      "w5_winsorize",
      """WITH pct AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (WHERE e.value < lo) AS BIGINT) AS n_clipped_low,
        |  CAST(count(*) FILTER (WHERE e.value > hi) AS BIGINT) AS n_clipped_high,
        |  CAST(sum(CAST(least(greatest(e.value, lo), hi) AS DECIMAL(18,6))) AS DOUBLE)
        |    AS clipped_sum
        |FROM events e JOIN pct ON e.event_type = pct.event_type
        |GROUP BY e.event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val pct = Tables.events(s, d).groupBy(col("event_type"))
        .agg(percentile(col("value"), lit(0.05)).as("lo"),
          percentile(col("value"), lit(0.95)).as("hi"))
      Tables.events(s, d).join(broadcast(pct), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_clipped_low"),
          sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_clipped_high"),
          sum(least(greatest(col("value"), col("lo")), col("hi"))
            .cast(DecimalType(18, 6))).cast("double").as("clipped_sum"))
    },

    // ---- U10: snapshot diff (corpus-version audit) ------------------------
    // The data-diff between two table versions: added / removed /
    // changed / unchanged per key, from ONE full-outer hash join on the
    // primary key comparing content hashes — rows never ship their
    // payload, only the 32-hex digest (at 100 TB the diff moves
    // key+hash, not data). Snapshots are staged once per source version
    // (marker-keyed, as u7/j2); the oracle recomputes both versions
    // from the base table with the same deterministic edits.
    QueryDef.sql(
      "u10_snapshot_diff",
      """WITH v1 AS (
        |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 3 <> 0),
        |v2 AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END) AS h
        |  FROM documents WHERE doc_id % 5 <> 0)
        |SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
        |  CASE WHEN v2.doc_id IS NULL THEN 'removed'
        |       WHEN v1.doc_id IS NULL THEN 'added'
        |       WHEN v1.h <> v2.h THEN 'changed'
        |       ELSE 'unchanged' END AS status
        |FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id""".stripMargin) { (s, d) =>
      val stageDir = s"/tmp/graft_u10_snapshots/${new java.io.File(d).getName}"
      Staging.stageOnce(stageDir, Staging.sourceKey(d, "documents")) {
        val docs = Tables.documents(s, d)
        docs.filter(col("doc_id") % 3 =!= 0)
          .select(col("doc_id"), md5(col("text")).as("h"))
          .write.mode("overwrite").parquet(s"$stageDir/v1")
        docs.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"),
            md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text"))).as("h"))
          .write.mode("overwrite").parquet(s"$stageDir/v2")
      }
      val v1 = s.read.parquet(s"$stageDir/v1").select(col("doc_id").as("id1"), col("h").as("h1"))
      val v2 = s.read.parquet(s"$stageDir/v2").select(col("doc_id").as("id2"), col("h").as("h2"))
      v1.join(v2, col("id1") === col("id2"), "full_outer")
        .select(coalesce(col("id1"), col("id2")).as("doc_id"),
          when(col("id2").isNull, "removed")
            .when(col("id1").isNull, "added")
            .when(col("h1") =!= col("h2"), "changed")
            .otherwise("unchanged").as("status"))
    },

    // ---- C10: deterministic reservoir sample (global k by keyed hash) ----
    // A fixed-size corpus sample that is reproducible on any cluster
    // layout AND stable under re-runs: global top-k by md5(key). The
    // plan is TakeOrderedAndProject — each map task ships its local
    // top-k, never a global sort. (c2 is the per-stratum variant.)
    QueryDef.sql(
      "c10_reservoir_sample",
      """SELECT doc_id, source FROM documents
        |ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .limit(100)
        .select(col("doc_id"), col("source"))
    },

    // ---- U9: latest record per key (CDC/upsert compaction) ---------------
    // The read-side of every mutable-table-on-immutable-storage design:
    // collapse an append-only event log to each key's most recent row.
    // One rank window per key; the rn = 1 bound pushes below the sort
    // (WindowGroupLimit), so map tasks ship one candidate row per key —
    // at 100 TB this is the compaction job that keeps CDC tables
    // queryable, and it never global-sorts.
    QueryDef.sql(
      "u9_latest_by_key",
      """SELECT user_id, event_id, ts, event_type, value FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
    },

    // ---- U11: SCD Type-2 dimension build (validity intervals) -------------
    // The slowly-changing-dimension table every warehouse derives from
    // a change log: per key, consecutive same-state rows coalesce into
    // one VERSION with [valid_from, valid_to) interval; the open
    // version (valid_to NULL) is current. Classic gaps-and-islands:
    // lag() marks state changes, a running ROWS-frame sum numbers the
    // islands, one aggregate collapses them, lead() closes the
    // intervals. Scale shape: every window partitions by user_id (the
    // natural key) — no global window, no skew (per-user history is
    // bounded); the whole build is ONE shuffle on user_id reused by
    // all three window steps plus the aggregate.
    QueryDef.sql(
      "u11_scd2_intervals",
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_state
        |  FROM events),
        |v AS (
        |  SELECT *, CAST(sum(CASE WHEN prev_state IS NULL
        |        OR prev_state <> event_type THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS version
        |  FROM o),
        |g AS (
        |  SELECT user_id, version,
        |    min(event_type) AS state,
        |    min(ts) AS valid_from,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM v GROUP BY user_id, version)
        |SELECT user_id, version, state, valid_from,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
        |    AS valid_to,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) IS NULL
        |    AS is_current,
        |  n_events
        |FROM g""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byEvent = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val byVersion = Window.partitionBy(col("user_id")).orderBy(col("version"))
      val o = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev_state", lag(col("event_type"), 1).over(byEvent))
      val v = o.withColumn("version",
        sum(when(col("prev_state").isNull || col("prev_state") =!= col("event_type"), 1L)
          .otherwise(0L))
          .over(byEvent.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val g = v.groupBy(col("user_id"), col("version"))
        .agg(min(col("event_type")).as("state"),
          min(col("ts")).as("valid_from"),
          count(lit(1)).as("n_events"))
      g.select(col("user_id"), col("version"), col("state"), col("valid_from"),
        lead(col("valid_from"), 1).over(byVersion).as("valid_to"),
        lead(col("valid_from"), 1).over(byVersion).isNull.as("is_current"),
        col("n_events"))
    },

    // ---- EV17: first/last-touch attribution --------------------------------
    // Conversion attribution: for each purchase, the view/click/signup
    // touches in the preceding 24 h window, credited first-touch and
    // last-touch. The touch↔conversion association is a point-in-
    // interval join, planned through operators.RangeJoin's bucketized
    // equi-join (one shuffle on (user_id, bucket)) — NOT the theta
    // join Spark would nested-loop. First/last selection is a pair of
    // rank windows per conversion whose rn=1 bound pushes below the
    // sort (WindowGroupLimit) — per-conversion touch lists never
    // globally sort. Ties break on (ts, touch_id) both engines.
    QueryDef.sql(
      "ev17_attribution",
      """WITH conv AS (
        |  SELECT user_id, event_id AS conv_id, ts AS conv_ts
        |  FROM events WHERE event_type = 'purchase'),
        |tch AS (
        |  SELECT user_id, event_id AS touch_id, event_type AS channel, ts
        |  FROM events WHERE event_type IN ('view', 'click', 'signup')),
        |j AS (
        |  SELECT c.user_id, c.conv_id, c.conv_ts, t.channel, t.ts, t.touch_id
        |  FROM conv c JOIN tch t ON c.user_id = t.user_id
        |   AND t.ts >= c.conv_ts - INTERVAL 24 HOUR AND t.ts < c.conv_ts),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY conv_id ORDER BY ts, touch_id) AS rf,
        |    row_number() OVER (PARTITION BY conv_id ORDER BY ts DESC, touch_id DESC)
        |      AS rl
        |  FROM j)
        |SELECT user_id, conv_id, conv_ts,
        |  max(channel) FILTER (WHERE rf = 1) AS first_channel,
        |  max(ts) FILTER (WHERE rf = 1) AS first_ts,
        |  max(channel) FILTER (WHERE rl = 1) AS last_channel,
        |  max(ts) FILTER (WHERE rl = 1) AS last_ts,
        |  CAST(count(*) AS BIGINT) AS n_touches
        |FROM r GROUP BY user_id, conv_id, conv_ts""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, d)
      val windowUs = 24L * 3600 * 1000000
      val conv = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("event_id").as("conv_id"),
        col("ts").as("conv_ts"),
        (unix_micros(col("ts")) - windowUs).as("lo_us"),
        unix_micros(col("ts")).as("hi_us"))
      val tch = ev.filter(col("event_type").isin("view", "click", "signup")).select(
        col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"), col("ts"),
        unix_micros(col("ts")).as("p_us"))
      val j = graft.operators.RangeJoin.pointInInterval(tch, conv, Seq("user_id"),
          "p_us", "lo_us", "hi_us", bucketWidth = windowUs)
        .select(col("user_id"), col("conv_id"), col("conv_ts"),
          col("channel"), col("ts"), col("touch_id"))
      val wf = Window.partitionBy(col("conv_id")).orderBy(col("ts"), col("touch_id"))
      val wl = Window.partitionBy(col("conv_id")).orderBy(col("ts").desc, col("touch_id").desc)
      j.withColumn("rf", row_number().over(wf))
        .withColumn("rl", row_number().over(wl))
        .groupBy(col("user_id"), col("conv_id"), col("conv_ts"))
        .agg(
          max(when(col("rf") === 1, col("channel"))).as("first_channel"),
          max(when(col("rf") === 1, col("ts"))).as("first_ts"),
          max(when(col("rl") === 1, col("channel"))).as("last_channel"),
          max(when(col("rl") === 1, col("ts"))).as("last_ts"),
          count(lit(1)).as("n_touches"))
    },

    // ---- EV18: time-series gap-fill + forward fill (resample) -------------
    // Metric resampling: 5-minute buckets per event_type, a dense grid
    // generated from each key's [min, max] bucket (explode of a tiny
    // per-key aggregate — never a driver loop), observed aggregates
    // left-joined on, and missing buckets forward-filled with
    // last(v, ignoreNulls) over an UNBOUNDED PRECEDING row frame.
    // Buckets are integer-µs arithmetic (no float epoch). At 100 TB the
    // fill window partitions by key — per-key sequential is inherent to
    // forward fill, and parallelism = #keys, not corpus size. Sums go
    // through DECIMAL so grid totals are order-independent.
    QueryDef.sql(
      "ev18_gapfill",
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) // 300000000 AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
        |      FROM b GROUP BY 1),
        |g AS (SELECT event_type, unnest(generate_series(lo, hi)) AS bucket
        |      FROM r)
        |SELECT g.event_type, g.bucket,
        |  make_timestamp(g.bucket * 300000000) AS bucket_ts,
        |  coalesce(b.n_obs, 0) AS n_obs, b.v AS v,
        |  last_value(b.v IGNORE NULLS) OVER (
        |    PARTITION BY g.event_type ORDER BY g.bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill
        |FROM g LEFT JOIN b
        |  ON g.event_type = b.event_type AND g.bucket = b.bucket""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val b = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 300000000").as("bucket"))
        .agg(count(lit(1)).as("n_obs"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("v"))
      val g = b.groupBy("event_type")
        .agg(min("bucket").as("lo"), max("bucket").as("hi"))
        .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("bucket"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      g.join(b, Seq("event_type", "bucket"), "left")
        .select(col("event_type"), col("bucket"),
          timestamp_micros(col("bucket") * lit(300000000L)).as("bucket_ts"),
          coalesce(col("n_obs"), lit(0L)).as("n_obs"), col("v"),
          last(col("v"), ignoreNulls = true).over(w).as("v_ffill"))
    },

    // ---- A20: recursive hierarchy closure + rollup (WITH RECURSIVE) ------
    // Spark 4 executes recursive CTEs natively (SPARK-24497), so the
    // classic warehouse hierarchy walk — ancestor closure over a parent
    // function, then aggregate descendants up to every ancestor — runs
    // as ONE declarative SQL statement in both engines. The hierarchy
    // is the deterministic decimal-digit tree over part keys
    // (parent(k) = k div 10), ~5 levels deep at bench scale. Scale
    // shape: each recursion step is a self-joinless projection (the
    // parent is computed, not joined), so the loop is k map stages +
    // one final aggregate shuffle on ancestor; depth is bounded by
    // log10(max key), far under Spark's recursion limit (100).
    QueryDef.sql(
      "a20_hierarchy_closure",
      """WITH RECURSIVE anc(node, ancestor, depth) AS (
        |  SELECT p_partkey, p_partkey // 10, 1 FROM part WHERE p_partkey >= 10
        |  UNION ALL
        |  SELECT node, ancestor // 10, depth + 1 FROM anc WHERE ancestor >= 10
        |)
        |SELECT a.ancestor, CAST(count(*) AS BIGINT) AS n_desc,
        |  max(a.depth) AS max_depth,
        |  CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS desc_price
        |FROM anc a JOIN part p ON p.p_partkey = a.node
        |GROUP BY a.ancestor""".stripMargin) { (s, d) =>
      Tables.part(s, d).createOrReplaceTempView("part")
      s.sql(
        """WITH RECURSIVE anc(node, ancestor, depth) AS (
          |  SELECT p_partkey, p_partkey div 10, 1 FROM part WHERE p_partkey >= 10
          |  UNION ALL
          |  SELECT node, ancestor div 10, depth + 1 FROM anc WHERE ancestor >= 10
          |)
          |SELECT a.ancestor, CAST(count(*) AS BIGINT) AS n_desc,
          |  max(a.depth) AS max_depth,
          |  CAST(sum(CAST(p.p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
          |    AS desc_price
          |FROM anc a JOIN part p ON p.p_partkey = a.node
          |GROUP BY a.ancestor""".stripMargin)
    },

    // ---- U12: incremental aggregate maintenance ---------------------------
    // The 100 TB warehouse refresh pattern: a stored per-(type, day)
    // partial aggregate plus the day's CDC delta, combined WITHOUT
    // rescanning history. Partials keep their DECIMAL sums (exact,
    // associative), so stored ⊕ delta is bit-identical to a full
    // recompute — which is exactly what the oracle does. Scale shape:
    // the stored table is read pre-aggregated (one row per group, not
    // per event); only the delta is scanned raw; the combine is one
    // partial-agg shuffle over group keys.
    QueryDef.sql(
      "u12_incremental_agg",
      """SELECT event_type, CAST(ts AS DATE) AS day,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, d) =>
      val stageDir = s"/tmp/graft_u12_agg/${new java.io.File(d).getName}"
      Staging.stageOnce(stageDir, Staging.sourceKey(d, "events")) {
        Tables.events(s, d)
          .filter(col("event_id") % 10 =!= 0)
          .groupBy(col("event_type"), col("ts").cast("date").as("day"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).as("v"))
          .write.mode("overwrite").parquet(s"$stageDir/stored")
      }
      val stored = s.read.parquet(s"$stageDir/stored")
      val delta = Tables.events(s, d)
        .filter(col("event_id") % 10 === 0)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).as("v"))
      stored.unionByName(delta)
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("n")).as("n_events"),
          sum(col("v")).cast("double").as("total"))
    },

    // ---- W6: distribution window functions --------------------------------
    // percent_rank / cume_dist / nth_value / first+last over an explicit
    // ROWS frame — the remaining SQL window surface beyond w1–w5. The
    // ordering key (o_totalprice, o_orderkey) is unique, and
    // percent_rank/cume_dist are pure integer-ratio doubles, so both
    // engines agree bit-for-bit with no rounding. One shuffle on
    // o_orderpriority shared by every window.
    QueryDef.sql(
      "w6_distribution_windows",
      """SELECT o_orderkey, o_orderpriority,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  nth_value(o_orderkey, 2) OVER
        |    (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key,
        |  first_value(o_orderkey) OVER
        |    (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cheapest_key,
        |  last_value(o_orderkey) OVER
        |    (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS lag2_key
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice, o_orderkey)""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byPrice = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val framed = byPrice.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        percent_rank().over(byPrice).as("pr"),
        cume_dist().over(byPrice).as("cd"),
        nth_value(col("o_orderkey"), 2).over(framed).as("second_key"),
        first_value(col("o_orderkey")).over(framed).as("cheapest_key"),
        last_value(col("o_orderkey"))
          .over(byPrice.rowsBetween(-2, Window.currentRow)).as("lag2_key"))
    },

    // ---- W7: exact EWMA (α=1/2, 16-lag) per user time series -----------
    // The recursive smoother e_t = α·v_t + (1-α)·e_{t-1} is iterative
    // float math — un-oracle-able (see STATE gotchas). With α=1/2 it
    // telescopes to integer weights 2^j over a bounded 16-lag window:
    // N = Σ_{k<m} cents_{t-k}·2^(15-k), D = 2^(16-m)·(2^m−1), both
    // EXACT integers (≤2^51), and the smoothed value is ONE float
    // division N/D — so the classic streaming-feature recurrence sits
    // under the bit-exact hash gate. One partitioned window per user
    // (keyed shuffle, no global ordering); weights truncate below
    // 2^-16 exactly where the float recurrence loses them anyway.
    QueryDef.sql(
      "w7_ewma_exact", {
        val lags = (0 to 15).map(k =>
          s"COALESCE(CAST(lag(cents, $k) OVER w AS BIGINT) * ${1L << (15 - k)}, 0)")
          .mkString(" + ")
        s"""WITH c AS (
           |  SELECT event_id, user_id, ts,
           |    CAST(floor(value * CAST(100.0 AS DOUBLE)) AS BIGINT) AS cents
           |  FROM events)
           |SELECT event_id, user_id,
           |  CAST(($lags) AS DOUBLE)
           |    / CAST((1 << (16 - least(CAST(row_number() OVER w AS BIGINT), 16)))
           |        * ((1 << least(CAST(row_number() OVER w AS BIGINT), 16)) - 1) AS DOUBLE)
           |    AS ewma
           |FROM c
           |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cents = floor(col("value") * lit(100.0)).cast("long")
      val num = (0 to 15).map(k =>
          coalesce(lag(col("cents"), k).over(w) * lit(1L << (15 - k)), lit(0L)))
        .reduce(_ + _)
      val m = least(row_number().over(w).cast("long"), lit(16L))
      val den = call_function("shiftleft", lit(1L), (lit(16L) - m).cast("int")) *
        (call_function("shiftleft", lit(1L), m.cast("int")) - 1L)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), cents.as("cents"))
        .select(col("event_id"), col("user_id"),
          (num.cast("double") / den.cast("double")).as("ewma"))
    },

    // ---- W8: exact rolling median (15-row window per user) -------------
    // Rolling robust statistics with NO percentile interpolation in
    // the hash path (engines disagree on interpolation — see a21):
    // the frame's integer cents are collected, sorted, and the two
    // middle ranks averaged with ONE float division (odd frames hit
    // the same element twice — (2a)/2.0 is exact). The window is
    // bounded (15 rows), partitioned per user — no global ordering,
    // state O(frame) per row.
    QueryDef.sql(
      "w8_rolling_median",
      """WITH c AS (
        |  SELECT event_id, user_id, ts,
        |    CAST(floor(value * CAST(100.0 AS DOUBLE)) AS BIGINT) AS cents
        |  FROM events),
        |f AS (
        |  SELECT event_id, user_id,
        |    list_sort(list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 14 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM c)
        |SELECT event_id, user_id,
        |  CAST(arr[CAST((len(arr) + 1) // 2 AS INT)]
        |     + arr[CAST(len(arr) // 2 + 1 AS INT)] AS DOUBLE)
        |    / CAST(2.0 AS DOUBLE) AS roll_median
        |FROM f""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-14, Window.currentRow)
      val cents = floor(col("value") * lit(100.0)).cast("long")
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"), cents.as("cents"))
        .select(col("event_id"), col("user_id"),
          sort_array(collect_list(col("cents")).over(w)).as("arr"))
        .select(col("event_id"), col("user_id"),
          ((element_at(col("arr"), ((size(col("arr")) + 1) / 2).cast("int"))
            + element_at(col("arr"), (size(col("arr")) / 2 + 1).cast("int"))).cast("double")
            / lit(2.0)).as("roll_median"))
    },

    // ---- F4: array higher-order functions ---------------------------------
    // The codegen'd array surface (transform / filter / aggregate /
    // zip_with / slice / contains) against DuckDB's list lambdas — the
    // fold seed and order are pinned on both sides so integer results
    // are identical. These are the primitives the vector and text
    // operators build on; here they're exercised stand-alone over a
    // deterministic sequence(1, p_size) so the oracle needs no
    // collect_list (which would impose an order Spark doesn't
    // guarantee).
    QueryDef.sql(
      "f4_array_funcs",
      """WITH a AS (SELECT p_partkey, p_size, range(1, p_size + 1) AS arr
        |           FROM part)
        |SELECT p_partkey,
        |  CAST(list_reduce(list_prepend(0, list_transform(arr, x -> x * x)),
        |    (acc, x) -> acc + x) AS BIGINT) AS sq_sum,
        |  CAST(len(list_filter(arr, x -> x % 2 = 0)) AS INT) AS n_even,
        |  CAST(list_reduce(list_prepend(0,
        |      list_transform(range(1, p_size + 1), i -> arr[i] * arr[p_size + 1 - i])),
        |    (acc, x) -> acc + x) AS BIGINT) AS rev_dot,
        |  array_to_string(arr[1:3], ',') AS head3,
        |  list_contains(arr, 7) AS has7
        |FROM a""".stripMargin) { (s, d) =>
      val arr = sequence(lit(1), col("p_size"))
      Tables.part(s, d).select(
        col("p_partkey"),
        aggregate(arr, lit(0L), (acc, x) => acc + x * x).as("sq_sum"),
        size(filter(arr, x => x % 2 === 0)).as("n_even"),
        aggregate(zip_with(arr, reverse(arr), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("rev_dot"),
        array_join(transform(slice(arr, 1, 3), _.cast("string")), ",").as("head3"),
        array_contains(arr, 7).as("has7"))
    },

    // ---- A21: robust outliers (median / MAD) ------------------------------
    // The robust twin of a15's z-score screen: median and median-
    // absolute-deviation instead of mean/stddev, so a single extreme
    // value can't drag the threshold. Medians are computed EXPLICITLY
    // (middle one/two rows by a unique rank, averaged as (a+b)*0.5 in
    // the identical op order both engines) rather than via the
    // engines' percentile functions, whose interpolation arithmetic
    // is not specified to the ulp. All downstream comparisons then
    // run on bit-identical doubles — no rounding, no boundary drift.
    // Scale shape: two rank windows partitioned by event_type (the
    // group key), one final partial-agg shuffle; no global window.
    QueryDef.sql(
      "a21_mad_outliers",
      """WITH r AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
        |  FROM events),
        |med AS (
        |  SELECT event_type,
        |    sum(CASE WHEN rn = (n + 1) // 2 THEN value ELSE 0 END)
        |      * CAST(0.5 AS DOUBLE)
        |    + sum(CASE WHEN rn = (n + 2) // 2 THEN value ELSE 0 END)
        |      * CAST(0.5 AS DOUBLE) AS med
        |  FROM r GROUP BY event_type),
        |dev AS (
        |  SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS d,
        |    row_number() OVER (PARTITION BY e.event_type
        |      ORDER BY abs(e.value - m.med), e.event_id) AS rn,
        |    CAST(count(*) OVER (PARTITION BY e.event_type) AS BIGINT) AS n
        |  FROM events e JOIN med m ON e.event_type = m.event_type),
        |mad AS (
        |  SELECT event_type,
        |    sum(CASE WHEN rn = (n + 1) // 2 THEN d ELSE 0 END)
        |      * CAST(0.5 AS DOUBLE)
        |    + sum(CASE WHEN rn = (n + 2) // 2 THEN d ELSE 0 END)
        |      * CAST(0.5 AS DOUBLE) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, CAST(max(d.n) AS BIGINT) AS n,
        |  round(max(d.med), 6) AS med, round(max(a.mad), 6) AS mad,
        |  CAST(sum(CASE WHEN d.d > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM dev d JOIN mad a ON d.event_type = a.event_type
        |GROUP BY d.event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      def medianOf(df: DataFrame, valueCol: String): DataFrame = {
        val byVal = Window.partitionBy(col("event_type"))
          .orderBy(col(valueCol), col("event_id"))
        val all = Window.partitionBy(col("event_type"))
        val r = df.withColumn("rn", row_number().over(byVal))
          .withColumn("n", count(lit(1)).over(all))
        // integer division for the middle ranks — Spark's `/` on
        // integers is double division, unlike the oracle's `//`
        val mid1 = expr("(n + 1) div 2")
        val mid2 = expr("(n + 2) div 2")
        r.groupBy("event_type").agg(
          (sum(when(col("rn") === mid1, col(valueCol)).otherwise(0.0))
             * lit(0.5)
           + sum(when(col("rn") === mid2, col(valueCol)).otherwise(0.0))
             * lit(0.5)).as(s"${valueCol}_med"))
      }
      val ev = Tables.events(s, d).select("event_type", "event_id", "value")
      val med = medianOf(ev, "value")
        .withColumnRenamed("value_med", "med")
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("d", abs(col("value") - col("med")))
      val mad = medianOf(dev, "d").withColumnRenamed("d_med", "mad")
      val all = Window.partitionBy(col("event_type"))
      dev.withColumn("n", count(lit(1)).over(all))
        .join(broadcast(mad), "event_type")
        .groupBy("event_type").agg(
          max(col("n")).as("n"),
          round(max(col("med")), 6).as("med"),
          round(max(col("mad")), 6).as("mad"),
          sum(when(col("d") > lit(3) * col("mad"), 1L).otherwise(0L)).as("n_outliers"))
    },

    // ---- C12: equi-depth length binning -----------------------------------
    // The quantile-bucketing pass a curriculum/length-balanced sampler
    // runs before mixing: ntile(10) over a UNIQUE ordering key
    // (n_chars, doc_id) assigns each document to a depth-balanced bin,
    // then per-bin edges and DECIMAL-exact mass come out of one
    // aggregate. Complements c9's fixed-width buckets. ntile is pure
    // integer arithmetic over the rank — deterministic in both
    // engines given the unique order.
    QueryDef.sql(
      "c12_equidepth_bins",
      """WITH b AS (
        |  SELECT doc_id, n_chars,
        |    ntile(10) OVER (ORDER BY n_chars, doc_id) AS bin
        |  FROM documents)
        |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(n_chars) AS lo, max(n_chars) AS hi,
        |  CAST(sum(CAST(n_chars AS DECIMAL(18,0))) AS BIGINT) AS total_chars
        |FROM b GROUP BY bin""".stripMargin) { (s, d) =>
      // NO unpartitioned ntile window: the global rank comes from the
      // two-phase ShardedRank (range shards + broadcast offsets) and
      // the ntile bucket from its closed form — first (n mod k) buckets
      // get (n div k)+1 rows, the rest n div k. Bit-identical to the
      // oracle's ntile(10) at any parallelism.
      val ranked = graft.operators.ShardedRank.withRank(
        Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
        "r", col("n_chars"), col("doc_id"))
      val n1 = ranked.agg(count(lit(1)).as("n"))
      ranked.crossJoin(broadcast(n1))
        .withColumn("bin", expr(
          """cast(case when r <= (n % 10) * (n div 10 + 1)
            |  then (r - 1) div (n div 10 + 1)
            |  else (n % 10) + (r - (n % 10) * (n div 10 + 1) - 1) div (n div 10)
            |end + 1 as int)""".stripMargin))
        .groupBy("bin").agg(
          count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("lo"),
          max(col("n_chars")).as("hi"),
          sum(col("n_chars").cast(DecimalType(18, 0))).cast("long").as("total_chars"))
    },

    // ---- EV22: linear-interpolation gap fill ------------------------------
    // The interpolating sibling of ev18's forward fill: missing 5-min
    // buckets take the straight line between the nearest observed
    // values on either side (sensor/metric imputation). prev/next
    // anchors come from IGNORE NULLS row frames over the same dense
    // grid. The interpolation runs in EXACT integer arithmetic —
    // observed sums carried as DECIMAL cents, weighted numerator and
    // denominator are BIGINTs, and the only float op is ONE division
    // of two exactly-representable integers — so no round() is needed
    // and no round-half boundary can split the engines (a first
    // round(6) draft lost one row in 42k to exactly that). Edges
    // (before the first / after the last observation) stay NULL.
    // Scale shape: same as ev18 — tiny per-key range aggregate
    // explodes the grid, one event_type shuffle shared by both
    // direction frames.
    QueryDef.sql(
      "ev22_linear_interp",
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) // 300000000 AS bucket,
        |    CAST(count(*) AS BIGINT) AS n_obs,
        |    SUM(CAST(value AS DECIMAL(18,2))) AS vd
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, min(bucket) AS lo, max(bucket) AS hi
        |      FROM b GROUP BY 1),
        |g AS (SELECT event_type, unnest(generate_series(lo, hi)) AS bucket
        |      FROM r),
        |j AS (
        |  SELECT g.event_type, g.bucket, b.n_obs, b.vd,
        |    last_value(CAST(b.vd * 100 AS BIGINT) IGNORE NULLS) OVER (
        |      PARTITION BY g.event_type ORDER BY g.bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_c,
        |    last_value(CASE WHEN b.vd IS NOT NULL THEN g.bucket END IGNORE NULLS)
        |      OVER (PARTITION BY g.event_type ORDER BY g.bucket
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_b,
        |    first_value(CAST(b.vd * 100 AS BIGINT) IGNORE NULLS) OVER (
        |      PARTITION BY g.event_type ORDER BY g.bucket
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_c,
        |    first_value(CASE WHEN b.vd IS NOT NULL THEN g.bucket END IGNORE NULLS)
        |      OVER (PARTITION BY g.event_type ORDER BY g.bucket
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_b
        |  FROM g LEFT JOIN b
        |    ON g.event_type = b.event_type AND g.bucket = b.bucket)
        |SELECT event_type, bucket, coalesce(n_obs, 0) AS n_obs,
        |  CAST(vd AS DOUBLE) AS v,
        |  CASE WHEN vd IS NOT NULL THEN CAST(vd AS DOUBLE)
        |       WHEN prev_c IS NOT NULL AND next_c IS NOT NULL THEN
        |         CAST(prev_c * (next_b - bucket) + next_c * (bucket - prev_b)
        |           AS DOUBLE)
        |         / CAST((next_b - prev_b) * 100 AS DOUBLE)
        |  END AS v_interp
        |FROM j""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val b = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 300000000").as("bucket"))
        .agg(count(lit(1)).as("n_obs"),
          sum(col("value").cast(DecimalType(18, 2))).as("vd"))
      val g = b.groupBy("event_type")
        .agg(min("bucket").as("lo"), max("bucket").as("hi"))
        .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("bucket"))
      val wPrev = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val cents = (col("vd") * 100).cast("long")
      val obsBucket = when(col("vd").isNotNull, col("bucket"))
      g.join(b, Seq("event_type", "bucket"), "left")
        .withColumn("prev_c", last(cents, ignoreNulls = true).over(wPrev))
        .withColumn("prev_b", last(obsBucket, ignoreNulls = true).over(wPrev))
        .withColumn("next_c", first(cents, ignoreNulls = true).over(wNext))
        .withColumn("next_b", first(obsBucket, ignoreNulls = true).over(wNext))
        .select(col("event_type"), col("bucket"),
          coalesce(col("n_obs"), lit(0L)).as("n_obs"),
          col("vd").cast("double").as("v"),
          when(col("vd").isNotNull, col("vd").cast("double"))
            .when(col("prev_c").isNotNull && col("next_c").isNotNull,
              (col("prev_c") * (col("next_b") - col("bucket"))
                + col("next_c") * (col("bucket") - col("prev_b"))).cast("double")
                / ((col("next_b") - col("prev_b")) * 100).cast("double"))
            .as("v_interp"))
    },

    // ---- ER1: end-to-end entity resolution --------------------------------
    // The full record-linkage pipeline as ONE composed operator:
    // blocked fuzzy match (j5's distinct-name banded Levenshtein) →
    // connected components (DupComponents' broadcast label
    // propagation) → canonical entity per component (min key, whose
    // name becomes the canonical name) with every row — including
    // singletons — assigned and consolidated. This is the composition
    // a dedup/master-data user actually runs; each stage is the
    // already-audited scale shape, and the whole pipeline stays under
    // the hash gate via DuckDB's levenshtein + recursive-CTE twin.
    QueryDef.sql(
      "er1_entity_resolution",
      """WITH RECURSIVE pr AS (
        |  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b
        |  FROM part a JOIN part b
        |    ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        |   AND abs(len(a.p_name) - len(b.p_name)) <= 2
        |  WHERE levenshtein(a.p_name, b.p_name) <= 2),
        |e AS (
        |  SELECT key_a AS src, key_b AS dst FROM pr
        |  UNION ALL SELECT key_b, key_a FROM pr),
        |reach(id, root) AS (
        |  SELECT DISTINCT src, src FROM e
        |  UNION
        |  SELECT e.dst, r.root FROM reach r JOIN e ON e.src = r.id),
        |comp AS (SELECT id, min(root) AS comp FROM reach GROUP BY id),
        |asg AS (
        |  SELECT p.p_partkey, coalesce(c.comp, p.p_partkey) AS entity_id,
        |    p.p_retailprice
        |  FROM part p LEFT JOIN comp c ON c.id = p.p_partkey),
        |agg AS (
        |  SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members,
        |    min(p_retailprice) AS min_price, max(p_retailprice) AS max_price
        |  FROM asg GROUP BY entity_id)
        |SELECT g.entity_id, g.n_members, p.p_name AS canonical_name,
        |  g.min_price, g.max_price
        |FROM agg g JOIN part p ON p.p_partkey = g.entity_id""".stripMargin) { (s, d) =>
      val pairs = fuzzyPartPairs(s, d)
        .select(col("key_a").as("id_a"), col("key_b").as("id_b"))
      val comp = graft.operators.DupComponents.components(s, pairs)
      val p = Tables.part(s, d)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      val assigned = p.join(comp, p("p_partkey") === comp("id"), "left")
        .select(col("p_partkey"),
          coalesce(col("comp"), col("p_partkey")).as("entity_id"),
          col("p_retailprice"))
      val agg = assigned.groupBy("entity_id").agg(
        count(lit(1)).as("n_members"),
        min(col("p_retailprice")).as("min_price"),
        max(col("p_retailprice")).as("max_price"))
      agg.join(p.select(col("p_partkey").as("entity_id"),
          col("p_name").as("canonical_name")), "entity_id")
        .select(col("entity_id"), col("n_members"), col("canonical_name"),
          col("min_price"), col("max_price"))
    },

    // ---- A22: multi-source BFS hop distance -------------------------------
    // Shortest hop count from a seed set over the part co-purchase
    // graph (a18's edge definition), depth-capped at 4. The iterative
    // frontier expansion is all-integer, so — like d7's fixed-point
    // PageRank — an iterative graph traversal sits under the exact-hash
    // gate via a DuckDB recursive-CTE twin. Scale shape: per round ONE
    // broadcast of the frontier (never the visited set) into the edge
    // scan + a distinct on the next frontier; edges are checkpointed
    // once and never reshuffled; the visited set only ever receives
    // unions. Above broadcast size the frontier join degrades to a
    // shuffle join with the loop unchanged.
    QueryDef.sql(
      "a22_bfs_hops",
      """WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |e0 AS (
        |  SELECT a.l_partkey AS src, b.l_partkey AS dst
        |  FROM op a JOIN op b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |seeds AS (SELECT p_partkey AS id FROM part WHERE p_size = 50),
        |bfs(id, hop) AS (
        |  SELECT id, 0 FROM seeds
        |  UNION
        |  SELECT e.dst, b.hop + 1 FROM bfs b JOIN e ON e.src = b.id
        |  WHERE b.hop < 4)
        |SELECT id AS part_id, CAST(min(hop) AS INTEGER) AS hop
        |FROM bfs GROUP BY id""".stripMargin) { (s, d) =>
      val op = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"))
      // r6 opt: aggregate-before-join pair build (PairGraph, see a18)
      val e0 = graft.operators.PairGraph.groupPairs(op, "l_orderkey", "l_partkey")
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("m")).filter(col("m") >= 2)
        .select(col("src"), col("dst"))
      val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
      var dist = Tables.part(s, d).filter(col("p_size") === 50)
        .select(col("p_partkey").as("id"), lit(0).as("hop"))
        .localCheckpoint(true)
      var frontier = dist.select(col("id"))
      var h = 1
      // r5 opt: the visited set is per-node (bounded like the frontier)
      // — broadcast it into the anti-join, and accumulate it as a plain
      // union of already-checkpointed rounds instead of re-checkpointing
      // the whole set every round (2 eager jobs per round saved; union
      // of checkpointed blocks adds no lineage). r6 (advice): the
      // frontier/visited broadcasts are GATED on the measured node
      // domain (PageRank's posture) — above the bound, shuffle joins.
      val hint: DataFrame => DataFrame =
        if (edges.count() <= 4000000L) broadcast else identity // nodes ≤ edges
      while (h <= 4 && !frontier.isEmpty) {
        val next = edges
          .join(hint(frontier.withColumnRenamed("id", "src")), "src")
          .select(col("dst").as("id")).distinct()
          .join(hint(dist.select(col("id"))), Seq("id"), "left_anti")
          .select(col("id"), lit(h).as("hop"))
          .localCheckpoint(true)
        dist = dist.union(next)
        frontier = next.select(col("id"))
        h += 1
      }
      dist.select(col("id").as("part_id"), col("hop").cast("int").as("hop"))
    },

    // ---- A23: Benford first-digit audit -----------------------------------
    // The fraud/data-quality screen: first-significant-digit counts and
    // shares per order status. The digit comes from integer string
    // arithmetic (floor → BIGINT → first char), NOT log10 — float logs
    // sit on exact-power boundaries and engines disagree there; the
    // share is ONE division of two exact integers. One partial-agg
    // shuffle on (status, digit); the per-status total is a 9-row
    // window, never a second scan.
    QueryDef.sql(
      "a23_benford_digits",
      """WITH d AS (
        |  SELECT o_orderstatus,
        |    CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
        |      AS INTEGER) AS digit
        |  FROM orders),
        |g AS (
        |  SELECT o_orderstatus, digit, CAST(count(*) AS BIGINT) AS n
        |  FROM d GROUP BY 1, 2)
        |SELECT o_orderstatus, digit, n,
        |  CAST(n AS DOUBLE)
        |    / CAST(CAST(sum(n) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS DOUBLE)
        |    AS share
        |FROM g""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val digit = substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit")
      val g = Tables.orders(s, d).select(col("o_orderstatus"), digit)
        .groupBy(col("o_orderstatus"), col("digit"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("o_orderstatus"))
      g.select(col("o_orderstatus"), col("digit"), col("n"),
        (col("n").cast("double") / sum(col("n")).over(w).cast("double")).as("share"))
    },

    // ---- EV23: OHLC time-bucket downsample --------------------------------
    // The metrics-store resample: per (event_type, 6-hour bucket) the
    // open/high/low/close/volume candle. Open/close are min_by/max_by
    // on the TOTAL order (ts, event_id) — deterministic under ties,
    // mirrored in the oracle as row_number over the same order — and
    // the whole candle is one partial-agg shuffle on the bucket key
    // (no window over the raw stream). Bucket ids stay integer
    // (epoch_us div width): reconstructing timestamps per engine is
    // where resamplers drift.
    QueryDef.sql(
      "ev23_ohlc_bars",
      """WITH e AS (
        |  SELECT event_type, epoch_us(ts) // 21600000000 AS bucket, value,
        |    row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 21600000000
        |                       ORDER BY ts, event_id) AS rn_a,
        |    row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 21600000000
        |                       ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events)
        |SELECT event_type, bucket,
        |  max(CASE WHEN rn_a = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rn_d = 1 THEN value END) AS close,
        |  CAST(count(*) AS BIGINT) AS volume
        |FROM e GROUP BY 1, 2""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 21600000000").as("bucket"))
        .agg(
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
          count(lit(1)).as("volume"))
    },

    // ---- EV24: max concurrency (interval sweep-line) ----------------------
    // "Peak simultaneous sessions" over event intervals [ts, ts+5min):
    // the classic sweep — +1/-1 deltas, running sum, max. Ordering by
    // (t, delta) closes ends before opens at the same instant
    // (end-exclusive intervals), and BOTH engines' default RANGE frame
    // sums all peers of (t, delta), so the running count is
    // deterministic even with tied timestamps. One shuffle to order
    // each type's timeline; at 100 TB the partition key is
    // (event_type, day) with per-day offsets carried over — the c4/c7
    // prefix-sum shape.
    QueryDef.sql(
      "ev24_max_concurrency",
      """WITH pts AS (
        |  SELECT event_type, epoch_us(ts) AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT event_type, epoch_us(ts) + 300000000, -1 FROM events),
        |r AS (
        |  SELECT event_type, delta,
        |    sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta) AS conc
        |  FROM pts)
        |SELECT event_type, CAST(max(conc) AS BIGINT) AS max_concurrent
        |FROM r WHERE delta = 1 GROUP BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val e = Tables.events(s, d)
        .select(col("event_type"), unix_micros(col("ts")).as("t"))
      val pts = e.select(col("event_type"), col("t"), lit(1).as("delta"))
        .union(e.select(col("event_type"), (col("t") + lit(300000000L)).as("t"),
          lit(-1).as("delta")))
      val w = Window.partitionBy(col("event_type")).orderBy(col("t"), col("delta"))
      pts.select(col("event_type"), col("delta"),
          sum(col("delta")).over(w).as("conc"))
        .filter(col("delta") === 1)
        .groupBy(col("event_type"))
        .agg(max(col("conc")).cast("long").as("max_concurrent"))
    },

    // ---- A24: HHI market-concentration audit ------------------------------
    // Herfindahl-Hirschman index of order counts across customers per
    // market segment — the standard concentration screen (antitrust /
    // vendor-risk / data-source balance). HHI = Σ share² computed as
    // sum_sq / total² — ONE double division of two exact BIGINTs, no
    // per-row share divisions to drift. Two partial-agg shuffles, the
    // second over |segments| rows; the customer dim is broadcast so
    // the orders scan never shuffles for the join.
    QueryDef.sql(
      "a24_hhi_concentration",
      """WITH n AS (
        |  SELECT c.c_mktsegment, o.o_custkey, CAST(count(*) AS BIGINT) AS n
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_accounts,
        |  CAST(sum(n) AS BIGINT) AS n_orders,
        |  CAST(sum(n * n) AS BIGINT) AS sum_sq,
        |  CAST(CAST(sum(n * n) AS BIGINT) AS DOUBLE)
        |    / (CAST(CAST(sum(n) AS BIGINT) AS DOUBLE)
        |       * CAST(CAST(sum(n) AS BIGINT) AS DOUBLE)) AS hhi
        |FROM n GROUP BY 1""".stripMargin) { (s, d) =>
      val n = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_custkey"))
        .agg(count(lit(1)).as("n"))
      n.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_accounts"),
          sum(col("n")).as("n_orders"),
          sum(col("n") * col("n")).as("sum_sq"))
        .select(col("c_mktsegment"), col("n_accounts"), col("n_orders"),
          col("sum_sq"),
          (col("sum_sq").cast("double")
            / (col("n_orders").cast("double") * col("n_orders").cast("double")))
            .as("hhi"))
    },

    // ---- Q18: large-volume orders (TPC-H Q18 shape) -----------------------
    // The "big buyers" report: orders whose total line quantity exceeds
    // a threshold, joined back to customer. The HAVING filter runs in
    // the aggregate BEFORE either join (Catalyst keeps it at the
    // partial-agg site), so only qualifying orderkeys reach the join;
    // orders↔lineitem co-partition on orderkey, customer is broadcast.
    // Quantity sums go through DECIMAL (exact under any partial-agg
    // order).
    QueryDef.sql(
      "q18_big_orders",
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        |SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
        |  o.o_totalprice, b.total_qty
        |FROM big b
        |JOIN orders o ON b.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin) { (s, d) =>
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("q"))
        .filter(col("q") > 150)
        .select(col("l_orderkey"), col("q").cast("double").as("total_qty"))
      big.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
    },

    // ---- F5: map higher-order functions (f4's map/struct sibling) ---------
    // Rounds out the function surface: per order, line quantities are
    // collected into a MAP (map_from_entries), doubled with
    // transform_values, thresholded with map_filter, point-probed with
    // element_at, and exploded back to rows. Quantities ride as integer
    // cents so every value is exact; the oracle states the same
    // semantics relationally (the map is plan-local — what must match
    // is the relation it denotes). One shuffle (the groupBy); map HOFs
    // are codegen-friendly expression trees, not UDFs.
    QueryDef.sql(
      "f5_map_funcs",
      """WITH c AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(sum(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem GROUP BY 1, 2),
        |f AS (
        |  SELECT l_orderkey,
        |    max(CASE WHEN l_linenumber = 1 THEN cents END) AS line1_qty_cents
        |  FROM c GROUP BY 1)
        |SELECT c.l_orderkey, f.line1_qty_cents, c.l_linenumber,
        |  c.cents * 2 AS qty2_cents
        |FROM c JOIN f USING (l_orderkey)
        |WHERE c.cents * 2 > 5000""".stripMargin) { (s, d) =>
      // l_linenumber repeats within an order in this corpus — aggregate
      // to unique keys first (map keys must be unique by contract)
      val m = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"), col("l_linenumber"))
        .agg(sum((col("l_quantity") * 100).cast("long")).as("cents"))
        .groupBy(col("l_orderkey"))
        .agg(map_from_entries(
          collect_list(struct(col("l_linenumber"), col("cents")))).as("m"))
      m.select(col("l_orderkey"),
          element_at(col("m"), lit(1)).as("line1_qty_cents"),
          explode(map_filter(
            transform_values(col("m"), (_, v) => v * 2),
            (_, v) => v > 5000L)))
        .select(col("l_orderkey"), col("line1_qty_cents"),
          col("key").as("l_linenumber"), col("value").as("qty2_cents"))
    },

    // ---- EV25: interval-union coverage (gaps-and-islands) -----------------
    // Total covered wall-clock per user after merging overlapping
    // [ts, ts+5min) activity intervals — the uptime/billable-time
    // algebra, and the companion of ev24's peak (sweep-line) view.
    // Islands open when the running max of prior interval ends sits
    // strictly before the next start (end-exclusive: touching
    // intervals merge); everything is integer µs so both engines agree
    // bit-for-bit. ONE shuffle on user_id drives both window steps and
    // the aggregates; per-user history is bounded, so no skew.
    QueryDef.sql(
      "ev25_interval_union",
      """WITH iv AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS s,
        |    epoch_us(ts) + 300000000 AS e
        |  FROM events),
        |m AS (
        |  SELECT *, max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
        |  FROM iv),
        |isl AS (
        |  SELECT *, CAST(sum(CASE WHEN pmax IS NULL OR pmax < s THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY s, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
        |  FROM m),
        |g AS (
        |  SELECT user_id, island, min(s) AS st, max(e) AS en
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
        |  CAST(sum(en - st) AS BIGINT) AS covered_us
        |FROM g GROUP BY 1""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val byStart = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
      val iv = Tables.events(s, d).select(
        col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("s"),
        (unix_micros(col("ts")) + 300000000L).as("e"))
      val m = iv.withColumn("pmax",
        max(col("e")).over(byStart.rowsBetween(Window.unboundedPreceding, -1)))
      val isl = m.withColumn("island",
        sum(when(col("pmax").isNull || col("pmax") < col("s"), 1L).otherwise(0L))
          .over(byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      isl.groupBy(col("user_id"), col("island"))
        .agg(min(col("s")).as("st"), max(col("e")).as("en"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          sum(col("en") - col("st")).as("covered_us"))
    },

    // ---- A25: two-proportion z-test (experimentation readout) -------------
    // The A/B-test decision statistic at the user-day unit: variants
    // split by id parity, a user-day is exposed if it saw any 'view'
    // and converts if it also logged a 'purchase'; pooled
    // two-proportion z on the conversion rates. Counts are exact
    // integers off ONE (user, day) aggregate (partial-agg friendly —
    // the shuffle key is the unit key, the variant pivot is a 2-row
    // reduction); the float tail is a single expression with IDENTICAL
    // op order in both engines, one sqrt, rounded to 6.
    QueryDef.sql(
      "a25_abtest_ztest",
      """WITH u AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(user_id % 2 AS INTEGER) AS variant,
        |    max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS exposed,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        |  FROM events GROUP BY 1, 2, 3),
        |g AS (
        |  SELECT variant, CAST(sum(exposed) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN exposed = 1 THEN converted ELSE 0 END) AS BIGINT) AS x
        |  FROM u GROUP BY 1),
        |w AS (
        |  SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
        |         max(CASE WHEN variant = 0 THEN x END) AS x0,
        |         max(CASE WHEN variant = 1 THEN n END) AS n1,
        |         max(CASE WHEN variant = 1 THEN x END) AS x1
        |  FROM g)
        |SELECT n0, x0, n1, x1,
        |  CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
        |  CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
        |  round((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |         - CAST(x0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |    / sqrt((CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |         * (1.0 - CAST(x0 + x1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |         * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))), 6) AS z
        |FROM w""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"),
          (col("user_id") % 2).cast("int").as("variant"))
        .agg(
          max(when(col("event_type") === "view", 1).otherwise(0)).as("exposed"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("converted"))
      val g = u.groupBy(col("variant"))
        .agg(sum(col("exposed")).as("n"),
          sum(when(col("exposed") === 1, col("converted")).otherwise(0)).as("x"))
      val w = g.agg(
        max(when(col("variant") === 0, col("n"))).as("n0"),
        max(when(col("variant") === 0, col("x"))).as("x0"),
        max(when(col("variant") === 1, col("n"))).as("n1"),
        max(when(col("variant") === 1, col("x"))).as("x1"))
      val p0 = col("x0").cast("double") / col("n0").cast("double")
      val p1 = col("x1").cast("double") / col("n1").cast("double")
      val pp = (col("x0") + col("x1")).cast("double") / (col("n0") + col("n1")).cast("double")
      w.select(col("n0"), col("x0"), col("n1"), col("x1"),
        p0.as("p0"), p1.as("p1"),
        round((p1 - p0) / sqrt(pp * (lit(1.0) - pp)
          * (lit(1.0) / col("n0").cast("double") + lit(1.0) / col("n1").cast("double"))), 6)
          .as("z"))
    }
  )
}
