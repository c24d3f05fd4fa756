package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the eighteenth frontier batch. */
class Frontier18QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a53 triples: ordered keys, support floor, consistent with pair supports") {
    val rows = run("a53_triple_itemsets").collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1) && r.getLong(1) < r.getLong(2))
      assert(r.getLong(3) >= 2)
      assert(r.getDouble(4) > 0)
    }
    // anti-monotonicity: a triple's support cannot exceed any member
    // pair's support (check against the (a,b) pair for each triple)
    if (rows.nonEmpty) {
      val basket = graft.Tables.lineitem(spark, sf("sf0.01"))
        .select(col("l_orderkey").as("o"), col("l_partkey").as("item")).distinct()
      val pairSup = basket.as("x").join(basket.as("y"),
          col("x.o") === col("y.o") && col("x.item") < col("y.item"))
        .groupBy(col("x.item").as("a"), col("y.item").as("b"))
        .agg(count(lit(1)).as("ps"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      rows.foreach { r =>
        assert(r.getLong(3) <= pairSup((r.getLong(0), r.getLong(1))))
      }
    }
  }

  test("a54 power law: ccdf monotone from 1.0, alpha > 1, node counts conserve") {
    val rows = run("a54_degree_powerlaw").collect().sortBy(_.getLong(0))
    assert(rows.nonEmpty)
    // ccdf decreases as degree increases; smallest degree has ccdf 1.0
    assert(math.abs(rows.head.getDouble(2) - 1.0) < 1e-12)
    rows.zip(rows.tail).foreach { case (a, b) =>
      assert(b.getDouble(2) <= a.getDouble(2))
    }
    val alpha = rows.head.getDouble(3)
    assert(alpha > 1.0, s"MLE exponent must exceed 1, got $alpha")
    assert(rows.forall(_.getDouble(3) == alpha))
    val nParts = graft.Tables.lineitem(spark, sf("sf0.01"))
      .select(col("l_partkey")).distinct().count()
    assert(rows.map(_.getLong(1)).sum == nParts)
  }

  test("t37 distinctive terms: 5 per source, lift-ranked, over-represented") {
    val rows = run("t37_distinctive_terms").collect()
    val bySource = rows.groupBy(_.getString(0))
    bySource.foreach { case (_, rs) =>
      assert(rs.length == 5)
      val sorted = rs.sortBy(_.getInt(4))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getDouble(3) > b.getDouble(3) ||
          (a.getDouble(3) == b.getDouble(3) && a.getString(1) < b.getString(1)))
      }
      // a source's most distinctive terms are over-represented there
      rs.foreach(r => assert(r.getDouble(3) >= 1.0,
        s"top-5 distinctive term ${r.getString(1)} has lift ${r.getDouble(3)} < 1"))
    }
  }
}
