package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for VERDICT r3 #6: the XML parse+raw-write stage is the
  * full build's floor (~46 s of 114 s at 50k docs). Times the
  * candidate parse strategies over the same corpus, same sparse
  * schema, and checksums EINs so a faster variant that drops or
  * mangles rows is disqualified immediately.
  *
  * Usage: runMain graft.engine.ParseFloor [nDocs] [workDir]
  */
object ParseFloor {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val work = if (args.length > 1) args(1) else "/tmp/graft_parse_floor"
    val corpusDir = s"$work/corpus"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.caseSensitive", "true")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(corpusDir))
    if (new java.io.File(corpusDir).list().length < n) {
      (0 until n).foreach { i =>
        val ein = f"${100000000L + i}%09d"
        val form = if (i % 5 == 4) "990PF" else if (i % 3 == 0) "990EZ" else "990"
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$corpusDir/${ein}_public.xml"),
          EngineBench.synthDoc(ein, post2013 = i % 2 == 0, form = form,
            gross = 1000L + (i * 37L) % 900000L, members = 1 + i % 4, seed = i))
      }
    }

    val refDir = "/root/reference"
    val master = Concordance.readCsv(spark, s"$refDir/MASTER_CONCORDANCE_V0.csv")
    val f9 = master.filter(_.rdbTable.startsWith("F9-PART-"))
    val pfMany = master.filterNot(_.rdbTable.startsWith("F9-PART-")).map(_.copy(cardinality = "MANY"))
    val schema = SchemaBuild.sparseSchema(f9 ++ pfMany,
      SchemaBuild.headerPaths ++ Core.declaredPaths ++ Core238.declaredPaths)

    def einChecksum(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val ein = Extract.scalar(df, Seq("/Return/ReturnHeader/Filer/EIN"))
      val r = df.select(count(lit(1)),
        sum(xxhash64(ein).cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
      (r.getLong(0), Option(r.getDecimal(1)).map(_.hashCode.toLong).getOrElse(0L))
    }

    def lap(label: String)(f: => (Long, Long)): Unit = {
      val t0 = System.nanoTime()
      val (cnt, sum) = f
      println(f"[parse-floor] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.1f s  docs=$cnt checksum=$sum")
    }

    // A. current production path: schema-first XML source, raw write
    lap("xml-source+write (current)") {
      val p = Ingest.readReturns(spark, corpusDir, Some(schema))
        .coalesce(spark.sparkContext.defaultParallelism)
      p.write.mode("overwrite").parquet(s"$work/rawA")
      einChecksum(spark.read.parquet(s"$work/rawA"))
    }
    // B. same, parse only (no write) — isolates the write's share
    lap("xml-source parse only") {
      einChecksum(Ingest.readReturns(spark, corpusDir, Some(schema)))
    }
    // C. legacy parser
    lap("xml-source legacy parser") {
      val df = spark.read.format("xml")
        .option("rowTag", "Return").option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("ignoreNamespace", "true")
        .option("useLegacyXmlParser", "true")
        .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
        .load(corpusDir)
      einChecksum(df)
    }
    // D. binaryFile bulk IO + from_xml per document
    lap("binaryFile+from_xml") {
      val bin = spark.read.format("binaryFile").load(corpusDir)
        .select(col("content").cast("string").as("xml"))
      val df = bin.select(from_xml(col("xml"), schema,
        new java.util.HashMap(java.util.Map.of("ignoreNamespace", "true", "mode", "PERMISSIVE"))).as("r"))
        .select(col("r.*"))
      einChecksum(df)
    }
    // width scaling: how does full-row parse cost scale with leaf count?
    val f9Schema = SchemaBuild.sparseSchema(f9,
      SchemaBuild.headerPaths ++ Core.declaredPaths ++ Core238.declaredPaths)
    def leaves(dt: org.apache.spark.sql.types.DataType): Int = dt match {
      case st: org.apache.spark.sql.types.StructType => st.fields.map(f => leaves(f.dataType)).sum
      case at: org.apache.spark.sql.types.ArrayType => leaves(at.elementType)
      case _ => 1
    }
    println(s"[parse-floor] full-schema leaves=${leaves(schema)} f9-schema leaves=${leaves(f9Schema)}")
    lap("full row, f9-only schema") {
      val df = Ingest.readReturns(spark, corpusDir, Some(f9Schema))
      (df.queryExecution.toRdd.count(), 0L)
    }
    // I. bundle small files into few big splits: one task per core
    lap("full row, bundled splits") {
      val before = (spark.conf.get("spark.sql.files.maxPartitionBytes"),
        spark.conf.get("spark.sql.files.openCostInBytes"))
      spark.conf.set("spark.sql.files.maxPartitionBytes", s"${512L*1024*1024}")
      spark.conf.set("spark.sql.files.openCostInBytes", "8192")
      try {
        val df = Ingest.readReturns(spark, corpusDir, Some(schema))
        println(s"[parse-floor]   partitions=${df.queryExecution.toRdd.getNumPartitions}")
        (df.queryExecution.toRdd.count(), 0L)
      } finally {
        spark.conf.set("spark.sql.files.maxPartitionBytes", before._1)
        spark.conf.set("spark.sql.files.openCostInBytes", before._2)
      }
    }
    // J. bundled splits + write — the production candidate
    lap("xml+write bundled (candidate)") {
      val before = (spark.conf.get("spark.sql.files.maxPartitionBytes"),
        spark.conf.get("spark.sql.files.openCostInBytes"))
      spark.conf.set("spark.sql.files.maxPartitionBytes", s"${512L*1024*1024}")
      spark.conf.set("spark.sql.files.openCostInBytes", "8192")
      try {
        val p = Ingest.readReturns(spark, corpusDir, Some(schema))
          .coalesce(spark.sparkContext.defaultParallelism)
        p.write.mode("overwrite").parquet(s"$work/rawJ")
        einChecksum(spark.read.parquet(s"$work/rawJ"))
      } finally {
        spark.conf.set("spark.sql.files.maxPartitionBytes", before._1)
        spark.conf.set("spark.sql.files.openCostInBytes", before._2)
      }
    }
    // F. full-row materialization WITHOUT write (toRdd count)
    lap("xml-source full row, no write") {
      val df = Ingest.readReturns(spark, corpusDir, Some(schema))
      val cnt = df.queryExecution.toRdd.count()
      (cnt, 0L)
    }
    // G. fewer output files (footer share): coalesce 8 instead of 32
    lap("xml+write coalesce(8)") {
      val p = Ingest.readReturns(spark, corpusDir, Some(schema)).coalesce(8)
      p.write.mode("overwrite").parquet(s"$work/rawG")
      einChecksum(spark.read.parquet(s"$work/rawG"))
    }
    // H. re-read + checksum share of variant A (cached files)
    lap("reread rawA checksum only") {
      einChecksum(spark.read.parquet(s"$work/rawA"))
    }
    // E. text wholetext + from_xml
    lap("wholetext+from_xml") {
      val txt = spark.read.option("wholetext", "true").text(corpusDir)
      val df = txt.select(from_xml(col("value"), schema,
        new java.util.HashMap(java.util.Map.of("ignoreNamespace", "true", "mode", "PERMISSIVE"))).as("r"))
        .select(col("r.*"))
      einChecksum(df)
    }
    spark.stop()
  }
}
