package graft.operators

import graft.SparkSpec

class DupComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("components labels every node with the min id of its component") {
    // two chains and one singleton pair: {1-2-3-4}, {10-11}, {20-21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (20L, 21L))
      .toDF("id_a", "id_b")
    val got = DupComponents.components(spark, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("a long chain converges (diameter > 2 rounds)") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = DupComponents.components(spark, pairs)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 12 && got.values.forall(_ == 1L))
  }

  test("empty pair set yields empty components") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(DupComponents.components(spark, pairs).count() == 0)
  }
}
