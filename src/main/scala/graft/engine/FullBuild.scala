package graft.engine

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

/** The full-database build a reference user runs today, in one job:
  * master-concordance wide core (every F9 variable) + the Part VII /
  * Sched J child tables from the real crosswalks — all from ONE cached
  * sparse-schema parse. Prints reference-comparable docs/sec.
  *
  * Usage: runMain graft.engine.FullBuild [nDocs] [workDir]
  * (uses /root/reference crosswalk CSVs when present; exits otherwise)
  */
object FullBuild {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val work = if (args.length > 1) args(1) else "/tmp/graft_full_build"
    val refDir = "/root/reference"
    if (!new java.io.File(s"$refDir/MASTER_CONCORDANCE_V0.csv").isFile) {
      System.err.println("[full-build] reference crosswalks not present; nothing to do")
      return
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      // XML element names are case-sensitive; the master crosswalk has
      // sibling fields differing only in case (e.g. AppliedToESTaxAmt)
      .config("spark.sql.caseSensitive", "true")
      // wide projections: whole-stage codegen defaults off above 100
      // fields (spark.sql.codegen.maxFields) - measured 2.4x on 305-col
      .config("spark.sql.codegen.maxFields", "4000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus (untimed)
    val corpusDir = s"$work/corpus"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(corpusDir))
    (0 until n).foreach { i =>
      val ein = f"${100000000L + i}%09d"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$corpusDir/${ein}_public.xml"),
        EngineBench.synthDoc(ein, post2013 = i % 2 == 0, ez = i % 3 == 0,
          gross = 1000L + (i * 37L) % 900000L, members = 1 + i % 4, seed = i))
    }

    val master = Concordance.readCsv(spark, s"$refDir/MASTER_CONCORDANCE_V0.csv")
    val partvii = Concordance.readCsv(spark, s"$refDir/BUILD_SCRIPTS/ConcordancePartVII.csv")
    val schedj = Concordance.readCsv(spark, s"$refDir/BUILD_SCRIPTS/ConcordanceSchedJ.csv")
    val childConcordance = partvii ++ schedj

    val t0 = System.nanoTime()
    // schema covers exactly what this build extracts: the F9 slice of
    // the master (not the PF/schedule paths we don't project) + the
    // child-table crosswalks + header/core paths
    val f9 = master.filter(_.rdbTable.startsWith("F9-PART-"))
    val schema = SchemaBuild.sparseSchema(f9 ++ childConcordance,
      SchemaBuild.headerPaths ++ Core.declaredPaths)
    val parsed = Ingest.readReturns(spark, corpusDir, Some(schema))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nParsed = parsed.count()
    val tParse = (System.nanoTime() - t0) / 1e9
    println(f"[full-build] parse: $nParsed docs in ${tParse}%.1fs (${nParsed / tParse}%.0f docs/s)")

    // one output table per F9 part (the master's DATABASE_TABLE layout;
    // the reference likewise writes per-table files). Bounded projection
    // width keeps every stage inside effective codegen — a single
    // 2,375-column projection measured ~12× slower than the sum of its
    // per-part projections.
    val parts = f9.map(_.rdbTable).distinct.sorted
    parts.foreach { p =>
      Emit.writeTable(TableBuild.oneToOne(parsed, f9, p), s"$work/out", p)
    }
    val childTables = childConcordance.filter(_.cardinality == "MANY").map(_.rdbTable).distinct
    childTables.foreach { t =>
      Emit.writeTable(TableBuild.oneToMany(parsed, childConcordance, t), s"$work/out", t)
    }
    val buildSec = (System.nanoTime() - t0) / 1e9

    val partStats = parts.map { p =>
      val df = spark.read.parquet(s"$work/out/$p")
      (p, df.count(), df.columns.length)
    }
    val totalCols = partStats.map(_._3 - TableBuild.headerNames.length).sum
    val childRows = childTables.map { t =>
      // a table whose group is absent from this corpus writes no files
      t -> scala.util.Try(spark.read.parquet(s"$work/out/$t").count()).getOrElse(0L)
    }.toMap
    println(f"[full-build] docs=$n build=${buildSec}%.1fs throughput=${n / buildSec}%.0f docs/s " +
      f"tables=${parts.length} vars=$totalCols rows/table=${partStats.head._2} " +
      childRows.map { case (k, v) => s"$k=$v" }.mkString(" "))
    spark.stop()
  }
}
