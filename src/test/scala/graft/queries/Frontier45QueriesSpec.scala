package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic guards for the forty-fifth frontier batch. */
class Frontier45QueriesSpec extends SparkSpec {

  private def run(name: String, dir: String = sf("sf0.01")) =
    graft.SparkEntry.queries(name)(spark, dir)

  test("a101 Shapley: four channels; efficiency holds up to div-24 truncation") {
    val rows = run("a101_shapley_attribution").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("click", "error", "signup", "view"))
    val phis = rows.map(_.getLong(1))
    val gain = rows.head.getLong(2)
    // Σφ = v(N) − v(∅) exactly before truncation; each of the 4 divs
    // truncates < 1 micro-unit
    assert(math.abs(phis.sum - gain) <= 4,
      s"efficiency: sum(phi)=${phis.sum} vs total_gain=$gain")
  }

  test("a102 depth-2 segmentation: root matches a71; children nest strictly") {
    val rows = run("a102_binary_segmentation").collect()
      .map(r => r.getString(0) -> (r.getDate(1), r.getLong(2))).toMap
    val root = run("a71_changepoint").collect()(0)
    assert(rows("root")._1.toString == root.getDate(0).toString,
      "root split must equal the single-changepoint answer")
    val rk = rows("root")._2
    rows.get("left").foreach { case (_, k) => assert(k < rk, "left child before root") }
    rows.get("right").foreach { case (_, k) => assert(k > rk, "right child after root") }
  }

  test("c38 randomized response: debiased estimate brackets the true rate") {
    val r = run("c38_randomized_response").collect()(0)
    val (n, trueCount, repCount) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (piHat, piTrue) = (r.getLong(3), r.getLong(4))
    assert(repCount <= n && trueCount <= n)
    // q=1/4 flips: reported count moves toward n/2; debias must land within
    // 4·sigma of truth, sigma^2 = q(1-q)/(n(1-2q)^2) => sigma_micro ~ 866025/sqrt(n)
    val sigmaMicro = (866025.0 / math.sqrt(n.toDouble)).toLong
    assert(math.abs(piHat - piTrue) <= 4 * sigmaMicro + 2,
      s"pi_hat=$piHat vs true=$piTrue beyond 4 sigma ($sigmaMicro)")
  }
}
