package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Eighty-ninth frontier batch: LSH S-curve calibration, KMV distinct
  * sketch with set algebra, newsvendor quantile decision.
  */
object Frontier89Queries {

  val defs: Seq[QueryDef] = Seq(

    // ---- T77: LSH S-curve calibration -----------------------------------------
    // Does the banding theory hold on THIS corpus? For a labeled pair
    // set (planted prefix families + consecutive-id background pairs),
    // compute exact 3-gram Jaccard, the 16-perm minhash signature
    // (8 bands × 2 rows), and whether any band collides — then compare
    // the EMPIRICAL collision rate per Jaccard decile to the textbook
    // 1−(1−s²)⁸ curve. This is how d3-style LSH parameters get chosen
    // and audited; every count is exact, the theory column is one
    // rounded double from the bucket midpoint.
    QueryDef.sql(
      "t77_lsh_s_curve",
      """WITH docs AS (
        |  SELECT doc_id, substring(text, 1, 96) AS tx,
        |    md5(substring(text, 1, 48)) AS fam
        |  FROM documents WHERE length(text) >= 3),
        |sh AS (
        |  SELECT DISTINCT doc_id, substring(tx, i.i, 3) AS g
        |  FROM docs, (SELECT unnest(generate_series(1, 94)) AS i) i
        |  WHERE i.i + 2 <= length(tx)),
        |shn AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nsh FROM sh GROUP BY 1),
        |sig AS (
        |  SELECT doc_id, j.j,
        |    CAST(min(('0x' || substr(md5(g || '|' || CAST(j.j AS VARCHAR)), 1, 12))::BIGINT)
        |      AS BIGINT) AS mh
        |  FROM sh, (SELECT unnest(generate_series(1, 16)) AS j) j
        |  GROUP BY 1, 2),
        |sigv AS (SELECT doc_id, list(mh ORDER BY j) AS sg FROM sig GROUP BY 1),
        |fp AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb
        |  FROM docs a JOIN docs b ON a.fam = b.fam AND a.doc_id < b.doc_id),
        |bg AS (
        |  SELECT a.doc_id AS ida, b.doc_id AS idb
        |  FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1),
        |pairs AS (SELECT DISTINCT ida, idb FROM (SELECT * FROM fp UNION ALL SELECT * FROM bg)),
        |inter AS (
        |  SELECT p.ida, p.idb, CAST(count(*) AS BIGINT) AS ni
        |  FROM pairs p
        |  JOIN sh sa ON sa.doc_id = p.ida
        |  JOIN sh sb ON sb.doc_id = p.idb AND sb.g = sa.g
        |  GROUP BY 1, 2),
        |scored AS (
        |  SELECT p.ida, p.idb,
        |    coalesce(i.ni, 0) * 10 //
        |      (na.nsh + nb.nsh - coalesce(i.ni, 0)) AS bucket,
        |    CASE WHEN len(list_filter(range(0, 8),
        |      b -> va.sg[b * 2 + 1] = vb.sg[b * 2 + 1]
        |       AND va.sg[b * 2 + 2] = vb.sg[b * 2 + 2])) > 0
        |      THEN 1 ELSE 0 END AS coll
        |  FROM pairs p
        |  LEFT JOIN inter i ON i.ida = p.ida AND i.idb = p.idb
        |  JOIN shn na ON na.doc_id = p.ida
        |  JOIN shn nb ON nb.doc_id = p.idb
        |  JOIN sigv va ON va.doc_id = p.ida
        |  JOIN sigv vb ON vb.doc_id = p.idb)
        |SELECT CAST(bucket AS INT) AS jaccard_decile,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(coll) AS BIGINT) AS n_collisions,
        |  CAST(sum(coll) * 1000 // count(*) AS BIGINT) AS empirical_permille,
        |  round(1 - pow(1 - pow((CAST(bucket AS DOUBLE) * 2 + 1) / 20, 2), 8), 6)
        |    AS theo_prob
        |FROM scored GROUP BY bucket ORDER BY 1""".stripMargin) { (s, d) =>
      // r5 opt: spread the single-row-group scan before the checkpoint
      // so the shingle explode + 16-way md5 signature pass downstream
      // start from parallel partitions, not one scan task.
      val docs = graft.operators.Spread.by(
          Tables.documents(s, d).filter(length(col("text")) >= 3),
          col("doc_id"))
        .select(col("doc_id"), substring(col("text"), 1, 96).as("tx"),
          md5(substring(col("text"), 1, 48)).as("fam"))
        .localCheckpoint(true) // shingles, pairs, and families read it
      val sh = docs
        .select(col("doc_id"), explode(sequence(lit(1), lit(94))).as("i"), col("tx"))
        .filter(col("i") + 2 <= length(col("tx")))
        .select(col("doc_id"), expr("substring(tx, i, 3)").as("g"))
        .distinct()
        .localCheckpoint(true) // shingle counts, signatures, intersections
      val shn = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("nsh"))
      val sig = sh
        .select(col("doc_id"), col("g"), explode(sequence(lit(1), lit(16))).as("j"))
        .select(col("doc_id"), col("j"),
          (conv(substring(md5(concat(col("g"), lit("|"), col("j").cast("string"))),
            1, 12), 16, 10).cast("long")).as("h"))
        .groupBy(col("doc_id"), col("j")).agg(min(col("h")).as("mh"))
      val sigv = sig
        .select(col("doc_id"), struct(col("j"), col("mh")).as("jm"))
        .groupBy(col("doc_id"))
        .agg(expr("transform(array_sort(collect_list(jm)), x -> x.mh)").as("sg"))
      val fp = docs.select(col("fam"), col("doc_id").as("ida"))
        .join(docs.select(col("fam"), col("doc_id").as("idb")), "fam")
        .filter(col("ida") < col("idb"))
        .select(col("ida"), col("idb"))
      val bg = docs.select(col("doc_id").as("ida"))
        .join(docs.select(col("doc_id").as("idb")), col("idb") === col("ida") + 1)
      val pairs = fp.unionByName(bg).distinct()
        .localCheckpoint(true) // intersection and scoring read them
      val inter = pairs
        .join(sh.select(col("doc_id").as("ida"), col("g")), "ida")
        .join(sh.select(col("doc_id").as("idb"), col("g")), Seq("idb", "g"))
        .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("ni"))
      val scored = pairs
        .join(inter, Seq("ida", "idb"), "left")
        .join(shn.select(col("doc_id").as("ida"), col("nsh").as("na")), "ida")
        .join(shn.select(col("doc_id").as("idb"), col("nsh").as("nb")), "idb")
        .join(sigv.select(col("doc_id").as("ida"), col("sg").as("va")), "ida")
        .join(sigv.select(col("doc_id").as("idb"), col("sg").as("vb")), "idb")
        .select(
          expr("coalesce(ni, 0) * 10 div (na + nb - coalesce(ni, 0))").as("bucket"),
          expr("""CASE WHEN size(filter(sequence(0, 7),
              b -> va[b * 2] = vb[b * 2] AND va[b * 2 + 1] = vb[b * 2 + 1])) > 0
            THEN 1 ELSE 0 END""").as("coll"))
      scored.groupBy(col("bucket").cast("int").as("jaccard_decile"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("coll")).cast("long").as("n_collisions"),
          expr("cast(sum(coll) * 1000 div count(1) as bigint)")
            .as("empirical_permille"))
        .withColumn("theo_prob",
          round(lit(1) - pow(lit(1) - pow((col("jaccard_decile").cast("double") * 2 + 1) / 20, 2), 8), 6))
        .orderBy(col("jaccard_decile"))
    },

    // ---- A145: KMV distinct sketch with set algebra ---------------------------
    // The k-minimum-values sketch: keep the 256 smallest 48-bit hashes
    // per set, estimate distinct counts as (k−1)·2⁴⁸ div θ (θ = the
    // k-th smallest), merge sketches for the union, and estimate the
    // intersection from sketch overlap — the mergeable-sketch algebra
    // a federated COUNT DISTINCT runs on. Sets: ordering customers vs
    // positive-balance customers. Estimates sit beside the EXACT
    // answers with permille errors — the calibration row a sketch
    // rollout decision reads. Small sets fall back to exact counting
    // (the standard KMV rule), keeping every scale green.
    QueryDef.sql(
      "a145_kmv_sketch",
      """WITH ha AS (
        |  SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT AS h
        |  FROM orders),
        |hb AS (
        |  SELECT DISTINCT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12))::BIGINT AS h
        |  FROM customer WHERE c_acctbal > 0),
        |ska AS (SELECT h FROM ha ORDER BY h LIMIT 256),
        |skb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
        |sku AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb) ORDER BY h LIMIT 256),
        |ca AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(max(h) AS BIGINT) AS th FROM ska),
        |cb AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(max(h) AS BIGINT) AS th FROM skb),
        |cu AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(max(h) AS BIGINT) AS th FROM sku),
        |ki AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k_int FROM sku u
        |  WHERE u.h IN (SELECT h FROM ska) AND u.h IN (SELECT h FROM skb)),
        |ex AS (
        |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM ha) AS xa,
        |    (SELECT CAST(count(*) AS BIGINT) FROM hb) AS xb,
        |    (SELECT CAST(count(*) AS BIGINT) FROM ha
        |     WHERE h IN (SELECT h FROM hb)) AS xi),
        |est AS (
        |  SELECT ex.xa, ex.xb, ex.xi,
        |    CASE WHEN ca.n < 256 THEN ca.n
        |      ELSE (ca.n - 1) * 281474976710656 // ca.th END AS ea,
        |    CASE WHEN cb.n < 256 THEN cb.n
        |      ELSE (cb.n - 1) * 281474976710656 // cb.th END AS eb,
        |    CASE WHEN cu.n < 256 THEN ki.k_int
        |      ELSE ki.k_int * ((cu.n - 1) * 281474976710656 // cu.th) // cu.n
        |      END AS ei
        |  FROM ca CROSS JOIN cb CROSS JOIN cu CROSS JOIN ki CROSS JOIN ex)
        |SELECT CAST(xa AS BIGINT) AS exact_a, CAST(ea AS BIGINT) AS est_a,
        |  CAST(abs(ea - xa) * 1000 // xa AS BIGINT) AS err_a_permille,
        |  CAST(xb AS BIGINT) AS exact_b, CAST(eb AS BIGINT) AS est_b,
        |  CAST(abs(eb - xb) * 1000 // xb AS BIGINT) AS err_b_permille,
        |  CAST(xi AS BIGINT) AS exact_inter, CAST(ei AS BIGINT) AS est_inter
        |FROM est""".stripMargin) { (s, d) =>
      def h(c: org.apache.spark.sql.Column) =
        conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")
      val ha = Tables.orders(s, d).select(h(col("o_custkey")).as("h")).distinct()
        .localCheckpoint(true) // sketch, exact count, and intersection
      val hb = Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .select(h(col("c_custkey")).as("h")).distinct()
        .localCheckpoint(true)
      val ska = ha.orderBy(col("h")).limit(256).localCheckpoint(true)
      val skb = hb.orderBy(col("h")).limit(256).localCheckpoint(true)
      val sku = ha.unionByName(hb).distinct().orderBy(col("h")).limit(256)
        .localCheckpoint(true)
      val ca = ska.agg(count(lit(1)).as("na"), max(col("h")).as("tha"))
      val cb = skb.agg(count(lit(1)).as("nb"), max(col("h")).as("thb"))
      val cu = sku.agg(count(lit(1)).as("nu"), max(col("h")).as("thu"))
      val ki = sku.join(ska, Seq("h"), "left_semi").join(skb, Seq("h"), "left_semi")
        .agg(count(lit(1)).as("k_int"))
      val ex = ha.agg(count(lit(1)).as("xa"))
        .crossJoin(hb.agg(count(lit(1)).as("xb")))
        .crossJoin(ha.join(hb, Seq("h"), "left_semi").agg(count(lit(1)).as("xi")))
      ex.crossJoin(broadcast(ca)).crossJoin(broadcast(cb))
        .crossJoin(broadcast(cu)).crossJoin(broadcast(ki))
        .select(
          col("xa"), col("xb"), col("xi"),
          expr("CASE WHEN na < 256 THEN na ELSE (na - 1) * 281474976710656 div tha END").as("ea"),
          expr("CASE WHEN nb < 256 THEN nb ELSE (nb - 1) * 281474976710656 div thb END").as("eb"),
          expr("""CASE WHEN nu < 256 THEN k_int
            ELSE k_int * ((nu - 1) * 281474976710656 div thu) div nu END""").as("ei"))
        .select(col("xa").as("exact_a"), col("ea").cast("long").as("est_a"),
          expr("cast(abs(ea - xa) * 1000 div xa as bigint)").as("err_a_permille"),
          col("xb").as("exact_b"), col("eb").cast("long").as("est_b"),
          expr("cast(abs(eb - xb) * 1000 div xb as bigint)").as("err_b_permille"),
          col("xi").as("exact_inter"), col("ei").cast("long").as("est_inter"))
    },

    // ---- A146: newsvendor quantile decision -----------------------------------
    // Inventory's canonical stochastic decision: with underage cost 8
    // and overage cost 2, stock the 0.8-quantile of weekly demand
    // (critical ratile = cu/(cu+co)) — per brand, from the empirical
    // weekly-demand distribution via exact order statistics (rank
    // r* = ⌈0.8·n⌉, never interpolation), then price the decision by
    // replaying every observed week against the chosen stock level in
    // exact integer units.
    QueryDef.sql(
      "a146_newsvendor",
      """WITH wk AS (
        |  SELECT p.p_brand,
        |    CAST(year(CAST(l.l_shipdate AS DATE)) AS INT) * 100 +
        |      CAST(weekofyear(CAST(l.l_shipdate AS DATE)) AS INT) AS yw,
        |    CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS demand
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |  GROUP BY 1, 2),
        |rk AS (
        |  SELECT p_brand, demand,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY demand, yw) AS r,
        |    count(*) OVER (PARTITION BY p_brand) AS n
        |  FROM wk),
        |q AS (
        |  SELECT p_brand, min(n) AS n,
        |    min(CASE WHEN r * 1000 >= 800 * n THEN demand END) AS qstar
        |  FROM rk GROUP BY 1),
        |cost AS (
        |  SELECT w.p_brand, q.n, q.qstar,
        |    CAST(sum(CASE WHEN q.qstar > w.demand
        |      THEN (q.qstar - w.demand) * 2
        |      ELSE (w.demand - q.qstar) * 8 END) AS BIGINT) AS total_cost
        |  FROM wk w JOIN q ON q.p_brand = w.p_brand
        |  GROUP BY 1, 2, 3)
        |SELECT p_brand, CAST(n AS BIGINT) AS n_weeks, CAST(qstar AS BIGINT) AS qstar,
        |  total_cost,
        |  CAST(total_cost * 1000 // n AS BIGINT) AS mean_cost_milli
        |FROM cost ORDER BY p_brand""".stripMargin) { (s, d) =>
      val wk = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"),
          (year(col("l_shipdate").cast("date")).cast("int") * 100 +
            weekofyear(col("l_shipdate").cast("date")).cast("int")).as("yw"))
        .agg(sum(col("l_quantity").cast("long")).cast("long").as("demand"))
        .localCheckpoint(true) // quantile pick and cost replay read it
      val wB = Window.partitionBy(col("p_brand"))
      val rk = wk
        .withColumn("r", row_number().over(wB.orderBy(col("demand"), col("yw"))))
        .withColumn("n", count(lit(1)).over(wB))
      val q = rk.groupBy(col("p_brand"))
        .agg(min(col("n")).as("n"),
          min(when(col("r") * 1000 >= col("n") * 800, col("demand"))).as("qstar"))
      wk.join(broadcast(q), "p_brand")
        .groupBy(col("p_brand"), col("n"), col("qstar"))
        .agg(sum(when(col("qstar") > col("demand"),
          (col("qstar") - col("demand")) * 2)
          .otherwise((col("demand") - col("qstar")) * 8)).cast("long")
          .as("total_cost"))
        .select(col("p_brand"), col("n").cast("long").as("n_weeks"),
          col("qstar").cast("long").as("qstar"), col("total_cost"),
          expr("cast(total_cost * 1000 div n as bigint)").as("mean_cost_milli"))
        .orderBy(col("p_brand"))
    }
  )
}
