package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** ZOrder correctness (vs a per-bit reference interleave) and the
  * property the operator exists for: a Z-ordered parquet layout keeps
  * per-file min/max ranges tight on BOTH keys, so a box predicate can
  * skip most files — where a single-key sort order prunes only its own
  * key and every file matches on the other one.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 31) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("interleave matches the per-bit reference, including 31-bit extremes") {
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (123456L, 654321L),
      (0x7FFFFFFFL, 0L), (0L, 0x7FFFFFFFL), (0x7FFFFFFFL, 0x7FFFFFFFL),
      (0x55555555L, 0x2AAAAAAAL))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1)), s"at $r")
      assert(r.getLong(2) >= 0L, s"z must stay non-negative (62 bits): $r")
    }
  }

  test("z-order monotone along each axis at a fixed other coordinate") {
    // a curve property pruning relies on: growing either coordinate
    // never decreases z when the other is fixed
    val xs = (0L to 200L).map(x => (x, 37L))
    val zs = xs.toDF("x", "y").select(ZOrder.interleave(col("x"), col("y")))
      .as[Long].collect()
    assert(zs.zip(zs.tail).forall { case (a, b) => a < b })
  }

  test("z-ordered layout skips files for a box predicate; x-sort does not") {
    // 64x64 grid of keys, written 16 files in two layouts
    val n = 64
    val grid = spark.range(0, n.toLong * n).select(
      (col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString

    grid.select(col("x"), col("y"), ZOrder.interleave(col("x"), col("y")).as("z"))
      .repartitionByRange(16, col("z")).sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(s"$tmp/zsorted")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$tmp/xsorted")

    // files whose [min,max] y-range intersects the predicate
    // y IN [8,15] = files a stats-pruning reader must open. The stripe
    // holds 1/8 of the rows; it is the NON-sort-key dimension for the
    // x-sorted layout — the case single-key clustering can't serve.
    def filesTouched(path: String): (Long, Long) = {
      val stats = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(min("y").as("y0"), max("y").as("y1"))
        .collect()
      val touched = stats.count { r =>
        !(r.getAs[Long]("y1") < 8 || r.getAs[Long]("y0") > 15)
      }
      (touched.toLong, stats.length.toLong)
    }

    val (zTouched, zTotal) = filesTouched(s"$tmp/zsorted")
    val (xTouched, xTotal) = filesTouched(s"$tmp/xsorted")
    assert(zTotal == 16 && xTotal == 16, s"expected 16 files: z=$zTotal x=$xTotal")
    // z-layout: the stripe lives in the 8 aligned 8x8 blocks of the
    // second quadrant row — at most half the files, typically far fewer
    assert(zTouched <= 8, s"z-layout should skip most files, touched $zTouched/16")
    // x-sorted: every file spans all y values — zero skipping on y
    assert(xTouched == 16, s"x-sorted layout cannot prune y, touched $xTouched/16")

    // both layouts hold identical data
    val a = spark.read.parquet(s"$tmp/zsorted").select("x", "y")
    val b = spark.read.parquet(s"$tmp/xsorted").select("x", "y")
    assert(a.unionAll(b).distinct().count() == n.toLong * n)
  }
}
