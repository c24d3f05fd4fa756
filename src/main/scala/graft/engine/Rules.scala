package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Production-rule library (SURVEY §2.4, R1–R9) as pure
  * `Column => Column` combinators — the reference's typed defaults,
  * conditional sums, and checkbox collapses re-expressed as Catalyst
  * expressions (all codegen'd; no UDFs).
  *
  * Parity note: the reference is stringly typed — defaults are the
  * STRING "0" (`build_efile_database_functions.R:10-12,30-35`) — so
  * these operate on string columns; the typed view casts afterwards.
  */
object Rules {

  /** R1 `zeroALL`: missing → "0" (`:30-35`). */
  def zeroAll(c: Column): Column = coalesce(c, lit("0"))

  /** R2 `zeroPC`/`zeroEZ`: default "0" only for the named form type —
    * the field does not exist on the other form (`:6-27`).
    */
  def zeroIf(c: Column, formType: Column, form: String): Column =
    when(formType === form, coalesce(c, lit("0"))).otherwise(c)
  def zeroPC(c: Column, formType: Column): Column = zeroIf(c, formType, "990")
  def zeroEZ(c: Column, formType: Column): Column = zeroIf(c, formType, "990EZ")

  /** R4/R5: NA-skipping row-wise sum over string-typed amount columns
    * (`sum(as.numeric(...), na.rm=T)`, `:1290-1305,1529,1542`). Null
    * only when ALL inputs are null (na.rm on an empty set).
    */
  def naSum(cols: Seq[Column]): Column = {
    val nums = cols.map(_.cast("double"))
    val total = nums.map(c => coalesce(c, lit(0.0))).reduce(_ + _)
    when(nums.map(_.isNull).reduce(_ && _), lit(null).cast("double")).otherwise(total)
  }

  /** R3: conditional source-or-sum — EZ reads one field; PC sums parts
    * (`EXPGAMINGFNDEVENTS`, `:1032-1043`).
    */
  def sourceOrSum(formType: Column, ezCol: Column, pcParts: Seq[Column]): Column =
    when(formType === "990EZ", ezCol.cast("double")).otherwise(naSum(pcParts))

  /** E5: checkbox recode — element presence → constant label
    * (FORMORGASSOC → "Association", `:553-561`).
    */
  def checkboxLabel(c: Column, label: String): Column =
    when(c.isNotNull, lit(label))

  /** R6: checkbox collapse — concat the recoded parts, "" → null
    * (FORMORG `gsub("NA","",paste(...))`, `:618-621`). Matches the
    * reference's left-to-right concatenation order exactly (golden
    * parity depends on it, SURVEY §7).
    */
  def checkboxCollapse(parts: Seq[Column]): Column =
    nullif(concat_ws("", parts: _*), lit(""))

  /** R7: TaxYear from TaxPeriod (YYYYMM): fiscal years ending in
    * December belong to that year; otherwise the prior year
    * (`:77-84`; `Build-Efiler-Index.md:93-102`).
    */
  def taxYear(taxPeriod: Column): Column = {
    val yr = substring(taxPeriod, 1, 4).cast("int")
    when(substring(taxPeriod, 5, 2) === "12", yr).otherwise(yr - 1)
  }

  /** Boolean normalization across vintages: "true"/"1"/"X" → true,
    * "false"/"0" → false (era-dependent encodings, SURVEY §1.2).
    */
  def asBoolean(c: Column): Column =
    when(upper(c).isin("TRUE", "1", "X"), lit(true))
      .when(upper(c).isin("FALSE", "0"), lit(false))
      .otherwise(lit(null).cast("boolean"))
}
