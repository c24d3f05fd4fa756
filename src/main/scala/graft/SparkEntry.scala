package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.{Core238E2E, CoreParityQueries, CurationQueries, Frontier2Queries, Frontier3Queries, Frontier4Queries, Frontier5Queries, Frontier6Queries, Frontier7Queries, Frontier10Queries, Frontier11Queries, Frontier12Queries, Frontier13Queries, Frontier14Queries, Frontier15Queries, Frontier16Queries, Frontier17Queries, Frontier18Queries, Frontier19Queries, Frontier20Queries, Frontier21Queries, Frontier22Queries, Frontier23Queries, Frontier24Queries, Frontier25Queries, Frontier26Queries, Frontier27Queries, Frontier28Queries, Frontier29Queries, Frontier30Queries, Frontier31Queries, Frontier32Queries, Frontier33Queries, Frontier34Queries, Frontier35Queries, Frontier36Queries, Frontier37Queries, Frontier38Queries, Frontier39Queries, Frontier40Queries, Frontier41Queries, Frontier42Queries, Frontier43Queries, Frontier44Queries, Frontier45Queries, Frontier46Queries, Frontier47Queries, Frontier48Queries, Frontier49Queries, Frontier50Queries, Frontier51Queries, Frontier52Queries, Frontier53Queries, Frontier54Queries, Frontier55Queries, Frontier56Queries, Frontier57Queries, Frontier58Queries, Frontier59Queries, Frontier60Queries, Frontier61Queries, Frontier62Queries, Frontier63Queries, Frontier64Queries, Frontier65Queries, Frontier66Queries, Frontier67Queries, Frontier68Queries, Frontier69Queries, Frontier70Queries, Frontier71Queries, Frontier72Queries, Frontier73Queries, Frontier75Queries, Frontier76Queries, Frontier77Queries, Frontier78Queries, Frontier79Queries, Frontier80Queries, Frontier81Queries, Frontier82Queries, Frontier83Queries, Frontier84Queries, Frontier85Queries, Frontier86Queries, Frontier87Queries, Frontier88Queries, Frontier89Queries, Frontier90Queries, Frontier91Queries, Frontier92Queries, Frontier93Queries, Frontier94Queries, Frontier95Queries, Frontier96Queries, Frontier97Queries, Frontier98Queries, Frontier99Queries, Frontier100Queries, Frontier101Queries, Frontier102Queries, Frontier103Queries, Frontier104Queries, Frontier105Queries, Frontier106Queries, Frontier107Queries, Frontier108Queries, Frontier109Queries, Frontier110Queries, Frontier111Queries, Frontier112Queries, Frontier113Queries, Frontier114Queries, Frontier115Queries, Frontier116Queries, Frontier117Queries, Frontier118Queries, Frontier119Queries, Frontier120Queries, Frontier121Queries, Frontier122Queries, Frontier123Queries, Frontier124Queries, Frontier125Queries, Frontier126Queries, Frontier127Queries, Frontier128Queries, Frontier129Queries, Frontier130Queries, Frontier8Queries, Frontier9Queries, FrontierQueries, MediaQueries, QueryDef, RelationalQueries, ScaleQueries, StreamingQueries, TextQueries, TpchQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the registered operator surface (one entry per
  * implemented operator from SURVEY.md §2 plus the training-data
  * pipeline extensions); `oracleSql` carries the DuckDB-equivalent SQL
  * for every SQL-expressible entry.
  */
object SparkEntry {

  private def allDefs: Seq[QueryDef] =
    RelationalQueries.defs ++ TpchQueries.defs ++ ScaleQueries.defs ++ TextQueries.defs ++
      CurationQueries.defs ++ VectorQueries.defs ++ MediaQueries.defs ++
      CoreParityQueries.defs ++ Core238E2E.defs ++ StreamingQueries.defs ++
      FrontierQueries.defs ++ Frontier2Queries.defs ++ Frontier3Queries.defs ++
      Frontier4Queries.defs ++ Frontier5Queries.defs ++ Frontier6Queries.defs ++
      Frontier7Queries.defs ++ Frontier8Queries.defs ++ Frontier9Queries.defs ++
      Frontier10Queries.defs ++ Frontier11Queries.defs ++ Frontier12Queries.defs ++
      Frontier13Queries.defs ++ Frontier14Queries.defs ++ Frontier15Queries.defs ++
      Frontier16Queries.defs ++ Frontier17Queries.defs ++ Frontier18Queries.defs ++
      Frontier19Queries.defs ++ Frontier20Queries.defs ++ Frontier21Queries.defs ++
      Frontier22Queries.defs ++ Frontier23Queries.defs ++ Frontier24Queries.defs ++
      Frontier25Queries.defs ++ Frontier26Queries.defs ++ Frontier27Queries.defs ++
      Frontier28Queries.defs ++ Frontier29Queries.defs ++ Frontier30Queries.defs ++
      Frontier31Queries.defs ++ Frontier32Queries.defs ++ Frontier33Queries.defs ++ Frontier34Queries.defs ++ Frontier35Queries.defs ++ Frontier36Queries.defs ++ Frontier37Queries.defs ++ Frontier38Queries.defs ++ Frontier39Queries.defs ++ Frontier40Queries.defs ++ Frontier41Queries.defs ++ Frontier42Queries.defs ++ Frontier43Queries.defs ++ Frontier44Queries.defs ++ Frontier45Queries.defs ++ Frontier46Queries.defs ++ Frontier47Queries.defs ++ Frontier48Queries.defs ++ Frontier49Queries.defs ++ Frontier50Queries.defs ++ Frontier51Queries.defs ++ Frontier52Queries.defs ++ Frontier53Queries.defs ++ Frontier54Queries.defs ++ Frontier55Queries.defs ++ Frontier56Queries.defs ++ Frontier57Queries.defs ++ Frontier58Queries.defs ++ Frontier59Queries.defs ++ Frontier60Queries.defs ++ Frontier61Queries.defs ++ Frontier62Queries.defs ++ Frontier63Queries.defs ++ Frontier64Queries.defs ++ Frontier65Queries.defs ++ Frontier66Queries.defs ++ Frontier67Queries.defs ++ Frontier68Queries.defs ++ Frontier69Queries.defs ++ Frontier70Queries.defs ++ Frontier71Queries.defs ++ Frontier72Queries.defs ++ Frontier73Queries.defs ++ Frontier75Queries.defs ++ Frontier76Queries.defs ++ Frontier77Queries.defs ++ Frontier78Queries.defs ++ Frontier79Queries.defs ++ Frontier80Queries.defs ++ Frontier81Queries.defs ++ Frontier82Queries.defs ++ Frontier83Queries.defs ++ Frontier84Queries.defs ++ Frontier85Queries.defs ++ Frontier86Queries.defs ++ Frontier87Queries.defs ++ Frontier88Queries.defs ++ Frontier89Queries.defs ++ Frontier90Queries.defs ++ Frontier91Queries.defs ++ Frontier92Queries.defs ++ Frontier93Queries.defs ++ Frontier94Queries.defs ++ Frontier95Queries.defs ++ Frontier96Queries.defs ++ Frontier97Queries.defs ++ Frontier98Queries.defs ++ Frontier99Queries.defs ++ Frontier100Queries.defs ++ Frontier101Queries.defs ++ Frontier102Queries.defs ++ Frontier103Queries.defs ++ Frontier104Queries.defs ++ Frontier105Queries.defs ++ Frontier106Queries.defs ++ Frontier107Queries.defs ++ Frontier108Queries.defs ++ Frontier109Queries.defs ++ Frontier110Queries.defs ++ Frontier111Queries.defs ++ Frontier112Queries.defs ++ Frontier113Queries.defs ++ Frontier114Queries.defs ++ Frontier115Queries.defs ++ Frontier116Queries.defs ++ Frontier117Queries.defs ++ Frontier118Queries.defs ++ Frontier119Queries.defs ++ Frontier120Queries.defs ++ Frontier121Queries.defs ++ Frontier122Queries.defs ++ Frontier123Queries.defs ++ Frontier124Queries.defs ++ Frontier125Queries.defs ++ Frontier126Queries.defs ++ Frontier127Queries.defs ++ Frontier128Queries.defs ++ Frontier129Queries.defs ++ Frontier130Queries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join + exact-decimal aggregate — the engine's bread and butter.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.orders(spark, d)
      .join(broadcast(Tables.customer(spark, d)), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .cast("double").as("total_price"))
      .orderBy(col("c_mktsegment"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (driver records a weaker rows-only check).
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
