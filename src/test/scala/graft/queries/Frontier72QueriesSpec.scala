package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the seventy-second frontier batch. */
class Frontier72QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a132 price index: base month indexes to ~1000 exactly") {
    val rows = run("a132_price_index").collect()
    assert(rows.nonEmpty)
    val base = rows.minBy(_.getString(0))
    // base month priced at base prices = exactly 1000 permille modulo
    // the per-part micro floor (cur and base terms are identical there)
    assert(base.getLong(2) == 1000, s"base index ${base.getLong(2)}")
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) > 200 && r.getLong(2) < 5000,
        s"${r.getString(0)}: implausible index ${r.getLong(2)}")
    }
  }

  test("c48 padding waste: sorted batching wastes strictly less") {
    val rows = run("c48_padding_waste").collect()
    val arrival = rows.find(_.getString(0) == "arrival").get
    val sorted = rows.find(_.getString(0) == "sorted").get
    assert(arrival.getLong(1) == sorted.getLong(1), "same batch count")
    assert(arrival.getLong(2) == sorted.getLong(2), "same total tokens")
    assert(sorted.getLong(3) < arrival.getLong(3),
      s"sorted ${sorted.getLong(3)} should waste less than arrival ${arrival.getLong(3)}")
    rows.foreach(r => assert(r.getLong(4) >= 0 && r.getLong(4) < 1000))
  }

  test("m11 caption alignment: chunks exactly partition tokens and frames") {
    val rows = run("m11_caption_align").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (0 until g.length))
      // frame spans tile the timeline with no gaps or overlaps
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b.getInt(3) == a.getInt(4) + 1)
        case _ =>
      }
      assert(sorted.head.getInt(3) == 0)
      // all chunks except possibly the last hold 16 tokens
      sorted.dropRight(1).foreach(r => assert(r.getLong(2) == 16))
      assert(sorted.last.getLong(2) >= 1 && sorted.last.getLong(2) <= 16)
    }
  }
}
