package graft.operators

import graft.SparkSpec

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: word-level BPE with greedy left-to-right
    * non-overlapping apply and (count DESC, pair ASC) argmax.
    */
  private def refMerges(texts: Seq[String], k: Int): Seq[(Int, String, String, Long)] = {
    val wf = scala.collection.mutable.Map.empty[String, Long]
    texts.foreach(_.toLowerCase.split("\\s+").filter(_.nonEmpty)
      .foreach(w => wf(w) = wf.getOrElse(w, 0L) + 1))
    var words: Map[String, Vector[String]] = wf.keys.map(w => w -> w.map(_.toString).toVector).toMap
    (1 to k).map { step =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- words; j <- 0 until syms.size - 1)
        pc((syms(j), syms(j + 1))) = pc.getOrElse((syms(j), syms(j + 1)), 0L) + wf(w)
      val ((a, b), c) = pc.minBy { case ((x, y), n) => (-n, x, y) }
      words = words.map { case (w, syms) =>
        val out = scala.collection.mutable.ArrayBuffer(syms.head)
        syms.tail.foreach { cur =>
          if (out.last == a && cur == b) out(out.size - 1) = a + b
          else out += cur
        }
        w -> out.toVector
      }
      (step, a, b, c)
    }
  }

  private def run(texts: Seq[String], k: Int) =
    BpeTrainer.learnMerges(spark, texts.toDF("text"), "text", k)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)

  test("matches the reference recurrence, including multi-char merges") {
    // 'ab' dominates round 1; round 2 must then see the merged symbol
    // in ('ab','c') — the true recurrence, not static bigram ranks
    val texts = Seq.fill(10)("abc abd abc") ++ Seq.fill(3)("xy xy zq")
    assert(run(texts, 4) == refMerges(texts, 4))
  }

  test("overlapping runs merge greedily left-to-right, non-overlapping") {
    // "aaaa" + merge (a,a): greedy gives (aa)(aa); pair count of the
    // round-2 table must see ('aa','aa'), never a re-overlap
    val texts = Seq.fill(5)("aaaa aaa")
    val got = run(texts, 2)
    assert(got == refMerges(texts, 2))
    assert(got.head._2 == "a" && got.head._3 == "a")
  }

  test("argmax tie-breaks on (count desc, left, right)") {
    // 'ba' and 'ab' tie on count; 'ab' < 'ba' lexicographically
    val texts = Seq.fill(4)("ab") ++ Seq.fill(4)("ba")
    val got = run(texts, 1)
    assert(got == refMerges(texts, 1))
    assert((got.head._2, got.head._3) == ("a", "b"))
  }
}
