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
    // "rawpq" (default, round 3): parse the XML once into a raw nested
    // parquet table; every table job reads THAT with parquet
    // nested-schema pruning — no monolithic staging projection exists
    // and each job stays codegen-sized (same-session A/B at 50k:
    // struct 500.6s → rawpq 114.3s, 4.4×, outputs identical).
    // "struct": ONE pass over the parse staging per-part struct blobs +
    // child group arrays into the columnar cache. "flat" stages one
    // cached column per variable instead. "cached"/"staged": earlier
    // shapes, kept for same-session A/B (host CPU swings ±3×).
    val mode = if (args.length > 2) args(2) else "rawpq"
    // scope "full" (default): all 9,731 master rows — PC+EZ+PF F9 parts
    // plus the 131 PF attachment-schedule tables. "f9": round-1 surface
    // (F9-PART tables only), for comparable throughput numbers.
    val scope = if (args.length > 3) args(3) else "full"
    val refDir = "/root/reference"
    if (!new java.io.File(s"$refDir/MASTER_CONCORDANCE_V0.csv").isFile) {
      System.err.println("[full-build] reference crosswalks not present; nothing to do")
      return
    }
    // Environment-derived knobs so the same entry point is
    // cluster-submittable: SPARK_GRAFT_MASTER=provided defers to
    // spark-submit's --master; pool/write-task sizes default from the
    // session's parallelism instead of local[32]-era constants.
    val masterEnv = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]")
    val builder0 = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // XML element names are case-sensitive; the master crosswalk has
      // sibling fields differing only in case (e.g. AppliedToESTaxAmt)
      .config("spark.sql.caseSensitive", "true")
      // wide projections: whole-stage codegen defaults off above 100
      // fields (spark.sql.codegen.maxFields) - measured 2.4x on 305-col
      // (struct mode; rawpq resets this, see below)
      .config("spark.sql.codegen.maxFields", "4000")
      .config("spark.ui.enabled", "false")
    val spark =
      (if (masterEnv == "provided") builder0 else builder0.master(masterEnv))
        .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Ingest.tuneSmallFileSplits(spark)
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
        spark.sparkContext.defaultParallelism.toString))
    val poolSize = sys.env.get("SPARK_GRAFT_POOL").map(_.toInt).getOrElse(8)
    val writeTasks = sys.env.get("SPARK_GRAFT_WRITE_TASKS").map(_.toInt)
      .getOrElse(math.max(4, spark.sparkContext.defaultParallelism / 8))
    val csv = sys.env.get("GRAFT_CSV").exists(v => v == "1" || v == "true")

    // corpus (untimed; deterministic — an existing dir with the right
    // file count is reused so A/B runs over one corpus)
    val corpusDir = s"$work/corpus"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(corpusDir))
    if (new java.io.File(corpusDir).list().length != n)
      (0 until n).foreach { i =>
        val ein = f"${100000000L + i}%09d"
        // form mix approximates the corpus (README.md:77-82): mostly PC,
        // with EZ and PF slices so every scope's build path is exercised
        val form = if (i % 5 == 4) "990PF" else if (i % 3 == 0) "990EZ" else "990"
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$corpusDir/${ein}_public.xml"),
          EngineBench.synthDoc(ein, post2013 = i % 2 == 0, form = form,
            gross = 1000L + (i * 37L) % 900000L, members = 1 + i % 4, seed = i))
      }

    val master = Concordance.readCsv(spark, s"$refDir/MASTER_CONCORDANCE_V0.csv")
    val partvii = Concordance.readCsv(spark, s"$refDir/BUILD_SCRIPTS/ConcordancePartVII.csv")
    val schedj = Concordance.readCsv(spark, s"$refDir/BUILD_SCRIPTS/ConcordanceSchedJ.csv")
    val childConcordance = partvii ++ schedj

    val t0 = System.nanoTime()
    // schema covers the FULL master: every F9-PART variable (PC+EZ+PF
    // scopes share the FORM-PART keys) plus the 131 non-F9 attachment
    // schedule tables (AFS etc.), plus child crosswalks + header/core
    val f9 = master.filter(_.rdbTable.startsWith("F9-PART-"))
    // non-F9 master rows: PF-style attachment schedules, repeating by
    // nature (the master V0 carries no cardinality column)
    val pfOne =
      if (scope == "f9") Nil
      else master.filterNot(_.rdbTable.startsWith("F9-PART-"))
    val pfMany = pfOne.map(_.copy(cardinality = "MANY"))
    val schema = SchemaBuild.sparseSchema(f9 ++ pfMany ++ childConcordance,
      SchemaBuild.headerPaths ++ Core.declaredPaths ++ Core238.declaredPaths)
    // flat mode consumes the parse exactly once (the staging pass), so
    // it neither caches the nested rows nor runs a timing pre-pass
    val parsed =
      if (mode == "flat" || mode == "struct" || mode == "rawpq")
        Ingest.readReturns(spark, corpusDir, Some(schema))
      else {
        val p = Ingest.readReturns(spark, corpusDir, Some(schema))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val nParsed = p.count()
        val tParse = (System.nanoTime() - t0) / 1e9
        println(f"[full-build] parse: $nParsed docs in ${tParse}%.1fs (${nParsed / tParse}%.0f docs/s)")
        p
      }

    // one output table per F9 part (the master's DATABASE_TABLE layout;
    // the reference likewise writes per-table files). Bounded projection
    // width keeps every stage inside effective codegen — a single
    // 2,375-column projection measured ~12× slower than the sum of its
    // per-part projections.
    val parts = f9.map(_.rdbTable).distinct.sorted
    val childTables = childConcordance.filter(_.cardinality == "MANY").map(_.rdbTable).distinct
    if (mode == "rawpq") {
      // Raw-parquet staging — the 100 TB shape: parse the XML ONCE and
      // write the nested document row as parquet; every downstream
      // table job then reads THAT with parquet nested-schema pruning,
      // so a 135-variable part build decodes ~135 leaf columns, not the
      // 4,900-leaf row. No monolithic 5,000-expression staging
      // projection exists: each job's projection is codegen-sized, and
      // the XML tokenizer (the real floor) runs exactly once.
      import org.apache.spark.sql.functions.col
      def lap(label: String)(f: => Unit): Unit = {
        val s = System.nanoTime(); f
        println(f"[full-build]   $label: ${(System.nanoTime() - s) / 1e9}%.1fs")
      }
      // The maxFields=4000 override exists for the struct-blob path
      // (narrow getField projections). Here every job is a wide
      // coalesce-chain projection: forcing whole-stage codegen on those
      // generates unsplittable >64KB consume methods — each job then
      // pays a failed janino compile before falling back. Split-method
      // UnsafeProjection (the default above 100 fields) is the right
      // code path for this shape.
      spark.conf.set("spark.sql.codegen.maxFields", "100")
      // vectorized-reader memory = leaves × batchSize × tasks; the
      // emptiness probe scans every group subtree in one job, so the
      // default 4096-row batches over thousands of leaf vectors OOM a
      // local heap. 512 keeps decode throughput, bounds the vectors.
      spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "512")
      val rawDir = s"$work/raw"
      // coalesce before the write so the parse runs one task per core
      // and the raw table lands in core-count files (not one tiny
      // wide-footer parquet file per bin-packed input split).
      //
      // TAXYR partitioning of the raw table makes year-scoped
      // derivations (the reference's buildYear unit) pure partition
      // pruning and the monthly refresh an append of year partitions —
      // the right layout at corpus scale, where each partition holds
      // GBs and the per-file footer of a 4,900-leaf schema is noise.
      // On a 50k-doc local corpus that same footer dominates (4× the
      // files cost ~35 s), so it is opt-in: GRAFT_RAW_PARTITION=1, or
      // implied by GRAFT_YEARS.
      val years = sys.env.get("GRAFT_YEARS").map(_.split(',').toSeq).getOrElse(Nil)
      val partitionRaw = years.nonEmpty ||
        sys.env.get("GRAFT_RAW_PARTITION").exists(v => v == "1" || v == "true")
      lap("parse+raw-write") {
        val base = parsed.coalesce(spark.sparkContext.defaultParallelism)
        if (partitionRaw)
          base.withColumn("TAXYR", Rules.taxYear(
              org.apache.spark.sql.functions.regexp_replace(
                Extract.scalar(parsed, Seq(
                  "/Return/ReturnHeader/TaxPeriodEndDt",
                  "/Return/ReturnHeader/TaxPeriodEndDate")),
                org.apache.spark.sql.functions.lit("-"),
                org.apache.spark.sql.functions.lit(""))).cast("string"))
            .write.mode("overwrite").partitionBy("TAXYR").parquet(rawDir)
        else base.write.mode("overwrite").parquet(rawDir)
      }
      // GRAFT_YEARS=2013,2014 scopes every derivation below to those
      // raw partitions (partition pruning — no other data is read)
      val rawAll = spark.read.parquet(rawDir)
      val raw =
        (if (years.nonEmpty) rawAll.filter(col("TAXYR").isin(years: _*)) else rawAll)
          .drop("TAXYR")

      val pfTables = pfOne.map(_.rdbTable).distinct.sorted
      val pfGroupsByTable: Map[String, Seq[TableBuild.EraGroup]] =
        pfTables.map(t => t -> TableBuild.eraGroups(raw, pfMany, t)).toMap
      val (pfManyTables, pfOneTables) = pfTables.partition(t => pfGroupsByTable(t).nonEmpty)
      val childOneTables = childConcordance
        .filter(e => e.cardinality == "ONE" && e.rdbTable.nonEmpty)
        .map(_.rdbTable).distinct.sorted
      val oneTables: Seq[(String, Seq[ConcordanceEntry])] =
        parts.map(p => p -> f9) ++ pfOneTables.map(t => t -> pfOne) ++
          childOneTables.map(t => t -> childConcordance)
      val manyTables: Seq[(String, Seq[ConcordanceEntry])] =
        childTables.map(t => t -> childConcordance) ++ pfManyTables.map(t => t -> pfMany)
      val manyArrays: Seq[(String, Seq[String], org.apache.spark.sql.Column)] =
        manyTables.flatMap { case (t, entries) =>
          pfGroupsByTable.get(t)
            .map(gs => TableBuild.normalizedGroupArray(gs, entries, t))
            .getOrElse(TableBuild.normalizedGroupArray(raw, entries, t))
            .map(a => (t, TableBuild.canonicalVars(entries, t), a))
        }

      val pool = new java.util.concurrent.ForkJoinPool(poolSize)
      def inParallel[A](xs: Seq[A])(f: A => Unit): Unit = {
        val tasks = xs.map(x => pool.submit(new java.util.concurrent.RecursiveAction {
          override def compute(): Unit = f(x)
        }))
        tasks.foreach(_.join())
      }
      // parquet always; headered CSV alongside under GRAFT_CSV=1 (the
      // reference's primary format, R:5130-5163)
      def emitTable(df: org.apache.spark.sql.DataFrame, t: String): Unit = {
        Emit.writeTable(df, s"$work/out", t)
        if (csv) Emit.exportCsv(df, s"$work/out_csv", t)
      }
      lap("part-writes")(inParallel(oneTables) { case (p, entries) =>
        emitTable(TableBuild.oneToOne(raw, entries, p).coalesce(writeTasks), p)
      })
      lap("core238")(
        emitTable(Core238.build(raw).coalesce(writeTasks), "core238"))
      // ONE pruned pass over the raw table finds non-empty 1:M groups;
      // empty ones write schema-only (no scan per empty table)
      import org.apache.spark.sql.functions.{coalesce => cl, lit, max, size}
      val sizesRow = raw.select(manyArrays.map { case (t, _, a) =>
        max(cl(size(a), lit(0))).as(t) }: _*).collect()(0)
      val hasRows = manyArrays.map { case (t, _, _) =>
        t -> (sizesRow.getAs[Int](t) > 0) }.toMap
      def emptyChild(canonical: Seq[String]) =
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(
            (TableBuild.headerNames ++ canonical).map(n =>
              org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType))))
      lap("child-tables")(inParallel(manyArrays) { case (t, canonical, a) =>
        val child =
          if (hasRows(t))
            raw.select(TableBuild.headerCols(raw) :+
                org.apache.spark.sql.functions.explode(a).as("item"): _*)
              .select(TableBuild.headerNames.map(col) ++
                canonical.map(v => col("item").getField(v).as(v)): _*)
              .coalesce(writeTasks)
          else emptyChild(canonical)
        emitTable(child, t)
      })
      val resolved = manyArrays.map(_._1).toSet
      inParallel(manyTables.filterNot(mt => resolved(mt._1))) { case (t, entries) =>
        emitTable(emptyChild(TableBuild.canonicalVars(entries, t)), t)
      }
      pool.shutdown()
      println(s"[full-build] pf tables: ${pfManyTables.length} grouped (1:M) + " +
        s"${pfOneTables.length} scalar (1:1)")
    } else if (mode == "flat" || mode == "struct") {
      // Stage ALL scalar variables as FLAT prefixed string columns plus
      // the child-table group arrays, in ONE pass over the parse (which
      // is never cached in its 4,900-leaf nested form). The in-memory
      // columnar cache stores one pruned-readable column per variable,
      // so a per-part pass touches only its ~135 columns and a child
      // pass only its group-array blob.
      import org.apache.spark.sql.functions.col
      def lap(label: String)(f: => Unit): Unit = {
        val s = System.nanoTime(); f
        println(f"[full-build]   $label: ${(System.nanoTime() - s) / 1e9}%.1fs")
      }
      // PF attachment schedules: resolve each non-F9 table's repeating
      // group; tables without one (scalar slices under the form root)
      // fall back to 1:1 wide tables
      val pfTables = pfOne.map(_.rdbTable).distinct.sorted
      val pfGroupsByTable: Map[String, Seq[TableBuild.EraGroup]] =
        pfTables.map(t => t -> TableBuild.eraGroups(parsed, pfMany, t)).toMap
      val (pfManyTables, pfOneTables) = pfTables.partition(t => pfGroupsByTable(t).nonEmpty)

      // crosswalk-declared 1:1 tables: PART VII table 00 compensation
      // overview + Sched J checklist / explanation text (reference
      // emits them alongside the 1:M tables, R:4400-4409, 4899-4910)
      val childOneTables = childConcordance
        .filter(e => e.cardinality == "ONE" && e.rdbTable.nonEmpty)
        .map(_.rdbTable).distinct.sorted
      // 1:1 tables: the 18 F9 parts + scalar PF slices + crosswalk 00s
      val oneTables: Seq[(String, Seq[ConcordanceEntry])] =
        parts.map(p => p -> f9) ++ pfOneTables.map(t => t -> pfOne) ++
          childOneTables.map(t => t -> childConcordance)
      val partCols = oneTables.map { case (p, entries) =>
        p -> TableBuild.varColumns(parsed, entries, _ == p)
      }.toMap
      // 1:M tables: the crosswalk child tables + grouped PF schedules
      val manyTables: Seq[(String, Seq[ConcordanceEntry])] =
        childTables.map(t => t -> childConcordance) ++ pfManyTables.map(t => t -> pfMany)
      // layout A ("flat"): one cached column per variable — cheapest
      // per-part reads, priciest cache build (2,500 column builders).
      // layout B ("struct"): one struct blob per part — cheap cache
      // build, per-part reads decode one blob.
      val stageCols =
        if (mode == "flat")
          oneTables.flatMap { case (p, _) =>
            partCols(p).map { case (v, c) => c.as(s"${p}__$v") } }
        else
          oneTables.collect { case (p, _) if partCols(p).nonEmpty =>
            org.apache.spark.sql.functions.struct(
              partCols(p).map { case (v, c) => c.as(v) }: _*).as(s"T_$p") }
      def partOutCols(p: String): Seq[org.apache.spark.sql.Column] =
        if (mode == "flat") partCols(p).map { case (v, _) => col(s"${p}__$v").as(v) }
        else partCols(p).map { case (v, _) => col(s"T_$p").getField(v).as(v) }
      // each 1:M table staged as ONE canonical-normalized array; PF
      // tables reuse the era groups already resolved for classification
      val manyArrays: Seq[(String, Seq[String], org.apache.spark.sql.Column)] =
        manyTables.flatMap { case (t, entries) =>
          pfGroupsByTable.get(t)
            .map(gs => TableBuild.normalizedGroupArray(gs, entries, t))
            .getOrElse(TableBuild.normalizedGroupArray(parsed, entries, t))
            .map(a => (t, TableBuild.canonicalVars(entries, t), a))
        }
      // the curated 238-column core rides the same staging pass as one
      // more struct blob (its own header columns included)
      val core238Struct = org.apache.spark.sql.functions.struct(
        Core238.ruleColumns(Core238.rawColumns(parsed), TableBuild.formType(parsed))
          .map { case (nm, c) => c.as(nm) }: _*).as("T_CORE238")
      val stagedSel = parsed
        .select(TableBuild.headerCols(parsed) ++ stageCols ++ Seq(core238Struct) ++
          manyArrays.map { case (t, _, a) => a.as(s"G_$t") }: _*)
      if (sys.env.contains("GRAFT_PROBE")) {
        // cost split: parse floor vs parse+extract (no cache write)
        lap("probe-parse-only")(parsed.count())
        lap("probe-noop-extract")(
          stagedSel.write.format("noop").mode("overwrite").save())
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        lap("probe-noop-extract-nowsc")(
          stagedSel.write.format("noop").mode("overwrite").save())
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
      }
      val staged = stagedSel.persist(StorageLevel.MEMORY_AND_DISK)
      // the 2,500-expression staging projection overflows whole-stage
      // codegen's method budget (JIT gives up on the huge method);
      // plain split-method UnsafeProjection is ~30% faster — toggle
      // WSC off for this one pass only
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      lap("stage-materialize")(staged.count())
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      // per-table output jobs are small; driver planning + job latency
      // dominates, so run them concurrently (a cluster does the same)
      val pool = new java.util.concurrent.ForkJoinPool(poolSize)
      def inParallel[A](xs: Seq[A])(f: A => Unit): Unit = {
        val tasks = xs.map(x => pool.submit(new java.util.concurrent.RecursiveAction {
          override def compute(): Unit = f(x)
        }))
        tasks.foreach(_.join())
      }
      lap("part-writes")(inParallel(oneTables.map(_._1)) { p =>
        val out = staged.select(TableBuild.headerNames.map(col) ++ partOutCols(p): _*)
        Emit.writeTable(out.coalesce(writeTasks), s"$work/out", p)
      })
      lap("core238")(
        Emit.writeTable(staged.select(col("T_CORE238.*")).coalesce(writeTasks), s"$work/out", "core238"))
      // ONE pass over the cache finds which 1:M tables have any rows;
      // empty ones get schema-only writes with no cache scan at all
      import org.apache.spark.sql.functions.{coalesce => cl, lit, max, size}
      val sizesRow = staged.select(manyArrays.map { case (t, _, _) =>
        max(cl(size(col(s"G_$t")), lit(0))).as(t) }: _*).collect()(0)
      val hasRows = manyArrays.map { case (t, _, _) =>
        t -> (sizesRow.getAs[Int](t) > 0) }.toMap
      def emptyChild(canonical: Seq[String]) =
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(
            (TableBuild.headerNames ++ canonical).map(n =>
              org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType))))
      lap("child-tables")(inParallel(manyArrays) { case (t, canonical, _) =>
        val child =
          if (hasRows(t)) TableBuild.childFromNormalized(staged, col(s"G_$t"), canonical).coalesce(writeTasks)
          else emptyChild(canonical)
        Emit.writeTable(child, s"$work/out", t)
      })
      // 1:M tables whose group is unresolvable in this corpus schema:
      // fixed-schema empty tables (parity with assembleChild's Nil case)
      val resolved = manyArrays.map(_._1).toSet
      inParallel(manyTables.filterNot(mt => resolved(mt._1))) { case (t, entries) =>
        Emit.writeTable(emptyChild(TableBuild.canonicalVars(entries, t)), s"$work/out", t)
      }
      pool.shutdown()
      staged.unpersist()
      println(s"[full-build] pf tables: ${pfManyTables.length} grouped (1:M) + " +
        s"${pfOneTables.length} scalar (1:1)")
    } else if (mode == "staged") {
      // ONE extraction pass: header + one struct per part. Each struct's
      // expression tree is bounded (~135 fields), so codegen stays
      // effective, and the cache stores 18 independent blob columns the
      // in-memory columnar scan can prune per part.
      import org.apache.spark.sql.functions.{col, struct}
      val partCols = parts.map(p =>
        p -> TableBuild.varColumns(parsed, f9, _ == p)).toMap
      val structCols = parts.filter(p => partCols(p).nonEmpty).map { p =>
        struct(partCols(p).map { case (v, c) => c.as(v) }: _*).as(s"T_$p")
      }
      def lap(label: String)(f: => Unit): Unit = {
        val s = System.nanoTime(); f
        println(f"[full-build]   $label: ${(System.nanoTime() - s) / 1e9}%.1fs")
      }
      val staged = parsed
        .select(TableBuild.headerCols(parsed) ++ structCols: _*)
        .persist(StorageLevel.MEMORY_AND_DISK)
      lap("stage-materialize")(staged.count())
      // child tables need the nested parse: run them while it is cached
      lap("child-tables")(childTables.foreach { t =>
        Emit.writeTable(TableBuild.oneToMany(parsed, childConcordance, t), s"$work/out", t)
      })
      parsed.unpersist()
      def partDf(p: String) = staged.select(
        TableBuild.headerNames.map(col) ++
          partCols(p).map { case (v, _) => col(s"T_$p").getField(v).as(v) }: _*)
      if (sys.env.contains("GRAFT_PROBE")) {
        lap("probe-counts")(parts.foreach(p => partDf(p).filter(col("EIN").isNotNull).count()))
        lap("probe-write-nopart")(parts.foreach(p =>
          partDf(p).write.mode("overwrite").parquet(s"$work/out_nopart/$p")))
        lap("probe-write-coalesced")(parts.foreach(p =>
          partDf(p).coalesce(writeTasks).write.mode("overwrite").partitionBy("TAXYR").parquet(s"$work/out_c4/$p")))
      }
      lap("part-writes")(parts.foreach(p => Emit.writeTable(partDf(p), s"$work/out", p)))
      staged.unpersist()
    } else {
      parts.foreach { p =>
        Emit.writeTable(TableBuild.oneToOne(parsed, f9, p), s"$work/out", p)
      }
      childTables.foreach { t =>
        Emit.writeTable(TableBuild.oneToMany(parsed, childConcordance, t), s"$work/out", t)
      }
    }
    val buildSec = (System.nanoTime() - t0) / 1e9

    val partStats = parts.map { p =>
      val df = spark.read.parquet(s"$work/out/$p")
      (p, df.count(), df.columns.length)
    }
    val totalCols = partStats.map(_._3 - TableBuild.headerNames.length).sum
    val childOne = childConcordance.filter(_.cardinality == "ONE")
      .map(_.rdbTable).distinct.sorted
    val childRows = (childTables ++ childOne ++ Seq("AFS-PART-01")).map { t =>
      // a table whose group is absent from this corpus writes no files
      t -> scala.util.Try(spark.read.parquet(s"$work/out/$t").count()).getOrElse(0L)
    }.toMap
    println(f"[full-build] docs=$n build=${buildSec}%.1fs throughput=${n / buildSec}%.0f docs/s " +
      f"tables=${parts.length} vars=$totalCols rows/table=${partStats.head._2} " +
      childRows.map { case (k, v) => s"$k=$v" }.mkString(" "))
    spark.stop()
  }
}
