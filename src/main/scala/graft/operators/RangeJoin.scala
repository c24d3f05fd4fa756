package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the other classic time-series
  * operator Spark lacks natively (alongside [[AsofJoin]]).
  *
  * A naive `p.join(iv, p("x") >= iv("lo") && p("x") < iv("hi"))` plans
  * as a broadcast-nested-loop / cartesian — quadratic, dead at scale.
  * The scale-safe shape (the one interval-join engines like Sedona use
  * for 1-D ranges) is fixed-width bucketization of the domain:
  *
  *  - every point lands in exactly ONE bucket (`floor(x / w)`);
  *  - every interval explodes to its covered buckets
  *    (`floor(lo/w) .. floor((hi-1)/w)` — hi exclusive), typically 1-2
  *    rows when `w` matches the median interval width;
  *  - an EQUI-join on (keys, bucket) + exact range post-filter.
  *
  * One shuffle, on a key whose cardinality is (join keys × domain/w);
  * candidate volume per bucket is bounded by bucket occupancy, and AQE
  * skew splitting covers hot buckets. Interval replication cost is
  * `ceil(width/w)` rows — pick `w` near the typical interval width so
  * replication stays O(1) per interval.
  *
  * Domain columns are LONGs (callers convert timestamps with
  * `unix_micros`), so bucket math is exact — the post-filter compares
  * the original values, never the bucketed ones.
  */
object RangeJoin {

  /** Join `points` (long `pointCol`) to `intervals` (long `loCol`,
    * `hiCol`; hi EXCLUSIVE) on equal `keys` and lo <= point < hi.
    * Output: key columns + all non-key columns of both inputs (names
    * must not collide). Empty/inverted intervals (hi <= lo) match
    * nothing.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                      pointCol: String, loCol: String, hiCol: String,
                      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", floorDiv(col(pointCol), bucketWidth))
    val iv = intervals
      .filter(col(hiCol) > col(loCol)) // sequence() would count DOWN on inverted bounds
      .withColumn("__bucket", explode(sequence(
        floorDiv(col(loCol), bucketWidth),
        floorDiv(col(hiCol) - 1, bucketWidth))))
    p.join(iv, keys :+ "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }

  /** Floor division for possibly-negative longs (Column algebra:
    * `pmod`-corrected quotient, matching Math.floorDiv). Uses integral
    * `div` — `/` on longs goes through double and rounds above 2^53,
    * which would silently misplace buckets for e.g. nanosecond
    * timestamps. (x − pmod) is exactly divisible by w; the only
    * unreachable corner is x within w of Long.MinValue, where the
    * subtraction would overflow — ANSI mode turns that into an error,
    * not a wrong answer.)
    */
  private def floorDiv(x: org.apache.spark.sql.Column, w: Long): org.apache.spark.sql.Column =
    call_function("div", x - pmod(x, lit(w)), lit(w))
}
