package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("native rolling hash equals the composed split+ascii fold on ASCII corpora") {
    val docs = Seq("", "a", "hello world", "The quick brown fox! 123",
      "x" * 500, (0 until 128).map(i => ('a' + i % 26).toChar).mkString)
    val df = docs.toDF("text")
    val got = df.select(
      RollingHash.rollhashNative($"text").as("native"),
      TextFunctions.rollingFingerprintComposed($"text").as("composed"))
      .as[(Long, Long)].collect()
    got.foreach { case (n, c) => assert(n == c, s"$n != $c") }
  }

  test("null propagates; empty string hashes to 0") {
    val df = Seq(Option("abc"), None, Option("")).toDF("text")
    val got = df.select(RollingHash.rollhashNative($"text")).as[Option[Long]].collect().toSeq
    assert(got(1).isEmpty && got(2).contains(0L) && got(0).nonEmpty)
  }

  test("graft_rollhash is callable from SQL and stays within the modulus") {
    val r = spark.sql("SELECT graft_rollhash('abc') AS h").as[Long].head()
    // 'a'=97,'b'=98,'c'=99: ((97*31+98)*31+99) % 1e9+7
    assert(r == ((97L * 31 + 98) * 31 + 99) % 1000000007L)
  }

  test("codegen path: expression runs inside a wholestage-codegen projection") {
    val df = spark.range(2000).select(concat(lit("doc-"), col("id").cast("string")).as("text"))
    val hashes = df.select(RollingHash.rollhashNative(col("text")).as("h"))
      .as[Long].collect()
    assert(hashes.distinct.length == hashes.length) // distinct docs -> distinct hashes here
    hashes.foreach(h => assert(h >= 0 && h < 1000000007L))
  }
}
