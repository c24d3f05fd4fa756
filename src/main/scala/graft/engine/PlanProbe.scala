package graft.engine

import org.apache.spark.sql.SparkSession

/** Dev probe: split FullBuild's per-part cost into plan time (driver
  * analysis/optimization) vs execution time, over a cached parse.
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val refDir = "/root/reference"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.codegen.maxFields", "4000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val master = Concordance.readCsv(spark, s"$refDir/MASTER_CONCORDANCE_V0.csv")
    val f9 = master.filter(_.rdbTable.startsWith("F9-PART-"))
    val corpus = "/tmp/graft_full_build/corpus"
    val schema = SchemaBuild.sparseSchema(f9, SchemaBuild.headerPaths ++ Core.declaredPaths)
    println(s"[probe] schema leaves ~ ${schema.treeString.linesIterator.size}")
    val parsed = Ingest.readReturns(spark, corpus, Some(schema))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[probe] parse+cache: ${time(parsed.count())._2}%s")

    Seq("F9-PART-00", "F9-PART-08").foreach { p =>
      val (df, tPlan0) = time(TableBuild.oneToOne(parsed, f9, p))
      val (_, tAnalyze) = time(df.queryExecution.executedPlan) // force analysis+planning
      val (_, tExec) = time(df.write.mode("overwrite").parquet(s"/tmp/probe_out/$p"))
      println(f"[probe] $p cols=${df.columns.length} build=$tPlan0%.1fs plan=$tAnalyze%.1fs exec=$tExec%.1fs")
    }

    // alternative shape: stage the parse as NESTED PARQUET, then read
    // per-part with nested-schema pruning (only the part's subtrees)
    val raw2 = Ingest.readReturns(spark, corpus, Some(schema))
    val (_, tStage) = time(raw2.write.mode("overwrite").parquet("/tmp/probe_staging"))
    println(f"[probe] stage-to-nested-parquet: $tStage%.1fs")
    val staged = spark.read.parquet("/tmp/probe_staging")
    Seq("F9-PART-00", "F9-PART-08").foreach { p =>
      val (_, tExec) = time(TableBuild.oneToOne(staged, f9, p)
        .write.mode("overwrite").parquet(s"/tmp/probe_out/staged_$p"))
      println(f"[probe] staged $p exec=$tExec%.1fs")
    }

    // alternative shape: ONE wide flat projection off the RAW parse
    // (no nested cache), then cache the flat table and select parts
    val raw = Ingest.readReturns(spark, corpus, Some(schema))
    val (wide, tW0) = time(TableBuild.wideTable(raw, f9, _.startsWith("F9-PART-")))
    val flat = wide.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (_, tWideCache) = time(flat.count())
    println(f"[probe] wide-flat build=$tW0%.1fs materialize+cache=$tWideCache%.1fs cols=${flat.columns.length}")
    val (_, tSel) = time(flat.select("EIN", "GROSSRRECEIP").write.mode("overwrite").parquet("/tmp/probe_out/sel"))
    val p08cols = f9.filter(_.rdbTable == "F9-PART-08").map(_.variable).distinct
    val (_, tP08) = time(flat.select(p08cols.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite").parquet("/tmp/probe_out/p08flat"))
    println(f"[probe] select-off-flat-cache: 2cols=$tSel%.1fs part08(${p08cols.size})=$tP08%.1fs")
    spark.stop()
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }
}
