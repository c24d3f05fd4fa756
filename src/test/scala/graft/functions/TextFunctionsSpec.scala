package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount counts whitespace-delimited tokens") {
    val df = Seq("one two  three", "", "  ", "solo").toDF("text")
    val got = df.select(TextFunctions.tokenCount($"text")).as[Int].collect().toSeq
    assert(got == Seq(3, 0, 0, 1))
  }

  test("tokens lower-cases and splits") {
    val got = Seq("Foo BAR baz").toDF("text")
      .select(TextFunctions.tokens($"text")).as[Seq[String]].head()
    assert(got == Seq("foo", "bar", "baz"))
  }

  test("wordShingles produces distinct w-grams; short docs collapse to one shingle") {
    val df = Seq("a b c d", "a b").toDF("text")
    val got = df.select(TextFunctions.wordShingles(TextFunctions.tokens($"text"), 3))
      .as[Seq[String]].collect().toSeq
    assert(got.head.toSet == Set("a b c", "b c d"))
    assert(got(1) == Seq("a b"))
  }

  test("shingleHashes is set-equivalent to hashing wordShingles") {
    // same cardinality and same pairwise overlap structure as the
    // string shingles (the property the d12 Jaccard join relies on),
    // without ever materializing a shingle string
    val texts = Seq("a b c d e", "b c d e f", "a b c d e", "x y", "q")
    val df = texts.toDF("text")
    val hs = df.select(
        TextFunctions.shingleHashes(TextFunctions.tokens($"text"), 3).as("h"),
        TextFunctions.wordShingles(TextFunctions.tokens($"text"), 3).as("s"))
      .as[(Seq[Long], Seq[String])].collect().toSeq
    hs.foreach { case (h, s) => assert(h.toSet.size == s.toSet.size) }
    // identical docs → identical hash sets; overlapping docs → overlap
    // count equal to the string-shingle overlap
    def ov[T](a: Seq[T], b: Seq[T]) = a.toSet.intersect(b.toSet).size
    for (i <- texts.indices; j <- texts.indices)
      assert(ov(hs(i)._1, hs(j)._1) == ov(hs(i)._2, hs(j)._2), s"pair ($i,$j)")
    // short docs collapse to exactly one shingle hash
    assert(hs(3)._1.size == 1 && hs(4)._1.size == 1)
  }

  test("rollingFingerprint matches a driver-side fold and is order-sensitive") {
    def ref(s: String): Long =
      s.foldLeft(0L)((acc, ch) => (acc * 31L + ch.toLong) % 1000000007L)
    val inputs = Seq("hello world", "world hello", "", "x")
    val got = inputs.toDF("text")
      .select(TextFunctions.rollingFingerprint($"text")).as[Long].collect().toSeq
    assert(got == inputs.map(ref))
    assert(got(0) != got(1)) // order matters
  }

  test("regexCount counts punctuation") {
    val got = Seq("a, b. c! d").toDF("text")
      .select(TextFunctions.regexCount($"text", "[.,;:!?]")).as[Int].head()
    assert(got == 3)
  }
}
