package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the seventieth frontier batch (incl. ev81s). */
class Frontier70QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("ev81s streaming CEP: equals a driver-side sequential replay") {
    val rows = run("ev81s_stream_cep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val replay = graft.Tables.events(spark, sf("sf0.01"))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0))
      .flatMap { case (u, g) =>
        var prog = 0; var k = 0L
        val out = Seq.newBuilder[(Long, Long, Long)]
        g.sortBy(r => (r.getTimestamp(2).getTime, r.getTimestamp(2).getNanos,
          r.getLong(1))).foreach { r =>
          r.getString(3) match {
            case "view" if prog == 0 => prog = 1
            case "click" if prog == 1 => prog = 2
            case "purchase" if prog == 2 =>
              prog = 0; k += 1; out += ((u, r.getLong(1), k))
            case _ => ()
          }
        }
        out.result()
      }.toSet
    assert(rows == replay)
  }

  test("c46 version chain: chain recurrence verifiable from any prefix") {
    val rows = run("c46_version_chain").collect().sortBy(_.getDate(0).toString)
    assert(rows.length == 30)
    var c = 0L
    rows.foreach { r =>
      c = (c * 31 + r.getLong(1)) % 1000000007L
      assert(r.getLong(2) == c, s"${r.getDate(0)}: chain mismatch")
      assert(r.getLong(1) >= 0 && r.getLong(1) < 1000000007L)
    }
    // tamper evidence: altering one digest changes every later value
    val digests = rows.map(_.getLong(1))
    var c2 = 0L
    val tampered = digests.updated(10, (digests(10) + 1) % 1000000007L)
    val chain2 = tampered.map { d => c2 = (c2 * 31 + d) % 1000000007L; c2 }
    (11 until 30).foreach(i => assert(chain2(i) != rows(i).getLong(2)))
  }
}
