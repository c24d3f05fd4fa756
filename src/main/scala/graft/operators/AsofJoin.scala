package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (most-recent-at-or-before) join — a core training-pipeline /
  * time-series operator Spark lacks natively.
  *
  * Plan shape: tag + union both sides, one shuffle on the key, one
  * window pass carrying the last right-side payload forward
  * (`last(_, ignoreNulls)` over rows preceding), keep left rows. No
  * range cross-product ever materializes and the state per key is one
  * row — this is the shape that survives skewed keys and 100 TB inputs
  * (vs. the naive time-range join, which explodes).
  *
  * The payload travels as ONE struct column, so every output field
  * comes from the SAME matched right row and a legitimately-NULL
  * payload field stays NULL (per-column `last(_, ignoreNulls)` would
  * skip it and leak an older row's value — SQL ASOF returns the
  * matched row as-is).
  *
  * Tie rule: a right row at exactly t matches a left row at t (right
  * sorts first via the src tag) — same as SQL `ASOF ... ON l.t >= r.t`.
  * Right side must be unique per (key, time) for determinism; callers
  * pre-aggregate (see ev3_asof_join).
  */
object AsofJoin {

  def asofLeft(left: DataFrame, right: DataFrame,
               leftKey: String, leftTime: String,
               rightKey: String, rightTime: String,
               payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asofLeft needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains), "payload names must not collide with left columns")

    val r = right.select(
      col(rightKey).as(leftKey),
      col(rightTime).as(leftTime),
      struct(payload.map(col): _*).as("__p"),
      lit(0).as("__src"))
    // left rows carry no payload struct → NULL after unionByName, so
    // ignoreNulls skips them; a right row with all-NULL payload FIELDS
    // is still a non-null struct and is carried as the match
    val l = left.withColumn("__src", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(col(leftKey))
      .orderBy(col(leftTime), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__p").getField(p).as(p)): _*)
  }

  /** FORWARD as-of: earliest right row at-or-after the left time —
    * SQL `ASOF ... ON l.t <= r.t` (the "next scheduled event" lookup).
    * Same union + one-window shape MIRRORED BY SORT ORDER, not by
    * frame direction: ordering by (time DESC, __src DESC) with the
    * usual preceding→current running frame means "last preceding
    * payload" = the right row with the SMALLEST time ≥ the left time,
    * and a right row at exactly t (tag 2 > tag 1) sorts before the
    * left row so the tie matches. A currentRow→unboundedFollowing
    * frame would give the same answer but Spark executes that frame
    * shape by re-scanning current→end for every row — O(n²) per key —
    * while the running frame is O(n).
    */
  def asofForward(left: DataFrame, right: DataFrame,
                  leftKey: String, leftTime: String,
                  rightKey: String, rightTime: String,
                  payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asofForward needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!payload.exists(leftCols.contains), "payload names must not collide with left columns")

    val r = right.select(
      col(rightKey).as(leftKey),
      col(rightTime).as(leftTime),
      struct(payload.map(col): _*).as("__p"),
      lit(2).as("__src"))
    val l = left.withColumn("__src", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(col(leftKey))
      .orderBy(col(leftTime).desc, col("__src").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned.withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__p").getField(p).as(p)): _*)
  }
}
