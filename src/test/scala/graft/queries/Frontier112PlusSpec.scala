package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent pins for the session's frontier flagships: the exact
  * integer sqrt ladder, Borůvka MST vs an in-test Kruskal, the OSA DP
  * fold vs a Scala reference, and the Elo fold vs a Scala replay.
  */
class Frontier112PlusSpec extends SparkSpec {

  test("isqrt correction ladder is exact across magnitudes") {
    val s = spark
    import s.implicits._
    val vals: Seq[String] =
      (Seq(0L, 1L, 2L, 3L, 4L, 15L, 16L, 17L, 999999L, 1000000L)
        .map(BigInt(_)) ++
        Seq(BigInt(Long.MaxValue), BigInt("4611686018427387904"),
          BigInt("499999999999999999999"), BigInt("500000000000000000000"),
          BigInt("999999999999999999999999999"),
          BigInt("123456789012345678901234567"))
          ++ (1 to 40).map(i => BigInt(i) * 7919 * 104729 * (i + 1)))
        .map(_.toString)
    val df = vals.toDF("vs").select(col("vs").cast("decimal(38,0)").as("v"))
      .withColumn("s0", floor(sqrt(col("v").cast("double"))).cast("long"))
      .withColumn("isq", expr(
        """s0 + CASE
          |  WHEN cast(s0 + 2 as decimal(38,0)) * cast(s0 + 2 as decimal(38,0)) <= v THEN 2
          |  WHEN cast(s0 + 1 as decimal(38,0)) * cast(s0 + 1 as decimal(38,0)) <= v THEN 1
          |  WHEN cast(s0 as decimal(38,0)) * cast(s0 as decimal(38,0)) <= v THEN 0
          |  WHEN cast(s0 - 1 as decimal(38,0)) * cast(s0 - 1 as decimal(38,0)) <= v THEN -1
          |  ELSE -2 END""".stripMargin))
    df.select(col("v"), col("isq")).collect().foreach { r =>
      val v = BigInt(r.getDecimal(0).toBigInteger)
      val got = BigInt(r.getLong(1))
      assert(got * got <= v && (got + 1) * (got + 1) > v,
        s"isqrt($v) = $got is not exact")
    }
  }

  test("a184 Borůvka MST equals an in-test Kruskal on the same graph") {
    val s = spark
    val dir = sf()
    // rebuild the undirected weighted graph exactly as the query does
    val pairs = graft.Tables.lineitem(s, dir)
      .join(graft.Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .join(graft.Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(graft.Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .groupBy(least(col("s_nationkey"), col("c_nationkey")).as("u"),
        greatest(col("s_nationkey"), col("c_nationkey")).as("v"))
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).cast("long")
        .as("w"))
      .withColumn("ew", expr("w * 1000000 + u * 1000 + v"))
    val edges = pairs.collect().map(r =>
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](3).longValue)) // (u, v, ew)
    // Kruskal with union-find, descending effective weight (max-ST)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val expected = edges.sortBy(-_._3).flatMap { case (u, v, _) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; Some((u, v)) } else None
    }.toSet
    val nat = graft.Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getString(1) -> r.getAs[Number](0).longValue).toMap
    val got = graft.SparkEntry.queries("a184_max_spanning_tree")(s, dir).collect()
      .map(r => (nat(r.getString(0)), nat(r.getString(1)))).toSet
    assert(got == expected, "Borůvka and Kruskal disagree")
  }

  test("t90 OSA fold matches a Scala reference implementation") {
    def osaRef(a: String, b: String): Int = {
      val (la, lb) = (a.length, b.length)
      val d = Array.ofDim[Int](la + 1, lb + 1)
      for (i <- 0 to la) d(i)(0) = i
      for (j <- 0 to lb) d(0)(j) = j
      for (i <- 1 to la; j <- 1 to lb) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + cost)
        if (i > 1 && j > 1 && a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1))
          d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + 1)
      }
      d(la)(lb)
    }
    val got = graft.SparkEntry.queries("t90_osa_distance")(spark, sf("sf0.01"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b, osa) = (r.getString(1), r.getString(2), r.getLong(3))
      assert(osa == osaRef(a, b), s"osa('$a','$b') = $osa vs ${osaRef(a, b)}")
    }
  }

  test("a190 Elo fold matches a Scala replay of the same match list") {
    val s = spark
    val dir = sf()
    val table = Array(4, 5, 6, 9, 11, 15, 20, 27, 35, 46, 61, 80, 104, 133,
      170, 215, 267, 327, 394, 464, 536, 606, 673, 733, 785, 830, 867, 896,
      920, 939, 954, 965, 973, 980, 985, 989, 991, 994, 995, 996)
    val drev = graft.Tables.orders(s, dir)
      .join(graft.Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .groupBy(col("o_orderdate").cast("date").as("day"),
        col("c_nationkey").as("nk"))
      .agg(sum(floor(col("o_totalprice") * 100).cast("long")).cast("long")
        .as("cents"))
    val matches = drev.collect()
      .groupBy(_.getDate(0)).toSeq.sortBy(_._1.toString)
      .flatMap { case (_, rows) =>
        val top = rows.sortBy(r => (-r.getAs[Number](2).longValue,
          r.getAs[Number](1).longValue)).take(2)
        if (top.length < 2) None
        else Some((top(0).getAs[Number](1).longValue,
          top(1).getAs[Number](1).longValue))
      }
    val ratings = Array.fill(25)(1500L)
    matches.foreach { case (wk, lk) =>
      val diff = ratings(wk.toInt) - ratings(lk.toInt)
      val bucket = math.min(math.max((diff + 1000) / 50, 0L), 39L).toInt
      val delta = (32L * (1000 - table(bucket))) / 1000
      ratings(wk.toInt) += delta
      ratings(lk.toInt) -= delta
    }
    val nat = graft.Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getString(1) -> r.getAs[Number](0).intValue).toMap
    val got = graft.SparkEntry.queries("a190_elo_ratings")(s, dir).collect()
    got.foreach { r =>
      assert(r.getLong(1) == ratings(nat(r.getString(0))),
        s"Elo mismatch for ${r.getString(0)}")
    }
  }
}
