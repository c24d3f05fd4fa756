package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * At 100 TB these reads are partitioned parquet scans; all queries in
  * [[graft.queries]] are written so filters/projections push down into
  * the scan (verify with `.explain("formatted")` → `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Driver parquet has changed flavor across rounds (TIMESTAMP(NANOS),
    * then instant-semantics micros, now naive micros which Spark 4 infers
    * as TIMESTAMP_NTZ). Disable NTZ inference at the reader so naive
    * parquet timestamps surface as plain TIMESTAMP — the one stable
    * schema the whole query surface is written against. This keeps the
    * conversion INSIDE the scan (filter pushdown on ts columns still
    * works, unlike a cast stacked on top), and with session timezone
    * UTC it is value-identical to DuckDB's naive reading of the files.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.parquet` carries INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects outright. Read nanos as long (legacy flag)
    * and truncate to microseconds (exact here — upstream values are
    * microsecond-resolution), keeping the public schema `ts: timestamp`.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
