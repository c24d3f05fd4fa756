package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join equals the unsalted join on skewed data") {
    // 90% of left rows share one hot key
    val left = (1 to 1000).map(i => (if (i <= 900) "hot" else s"k$i", i))
      .toDF("k", "lv")
    val right = Seq(("hot", "H"), ("k901", "A"), ("k950", "B"), ("miss", "C"))
      .toDF("k", "rv")
    val plain = left.join(right, Seq("k"))
      .select("k", "lv", "rv").as[(String, Int, String)].collect().toSet
    val salted = SaltedJoin.innerSalted(left, right, "k", buckets = 8, leftSeed = Seq("lv"))
      .select("k", "lv", "rv").as[(String, Int, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == "hot") == 900)
  }

  test("salt is deterministic and bounded") {
    val df = (1 to 100).toDF("x")
      .select(SaltedJoin.salt(8, col("x")).as("s"))
    val s1 = df.as[Int].collect().toSeq
    val s2 = df.as[Int].collect().toSeq
    assert(s1 == s2)
    assert(s1.forall(s => s >= 0 && s < 8))
    assert(s1.distinct.size > 1)
  }
}
