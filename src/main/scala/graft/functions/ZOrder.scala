package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve encoding as a pure Column tree.
  *
  * Interleaves the low 31 bits of two keys into one 62-bit value whose
  * lexicographic order is the space-filling curve over (x, y). Sorting
  * (or `repartitionByRange`) a table by this value clusters rows that
  * are close in BOTH dimensions into the same files, so parquet
  * min/max (file- and row-group-level) statistics prune scans for box
  * predicates on either key — the data-layout trick behind
  * Delta/Iceberg Z-ORDER clustering, expressed here with nothing but
  * codegen'd bitwise functions (no UDF, no custom expression).
  *
  * The spread uses the classic five mask-and-shift doublings. Each
  * step masks AFTER the shift; inputs are masked to 31 bits first so
  * no intermediate ever reaches bit 63 — the arithmetic stays in
  * non-negative BIGINT territory on any engine (DuckDB raises on
  * left-shift overflow; the same literals render there as decimal
  * constants).
  */
object ZOrder {

  /** (shift, mask-after-shift) doubling steps for a 31-bit input. */
  val Steps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 31 bits of `c` to the even bit positions 0,2,..,60. */
  def spread(c: Column): Column =
    Steps.foldLeft(c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (v, (n, mask)) => v.bitwiseOR(shiftleft(v, n)).bitwiseAND(lit(mask))
    }

  /** 62-bit Morton code of (x, y): x on even bits, y on odd bits. */
  def interleave(x: Column, y: Column): Column =
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
}
