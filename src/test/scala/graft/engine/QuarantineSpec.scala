package graft.engine

import graft.SparkSpec

/** The FAIL_LIST analogue end-to-end: corrupt documents must land in
  * the quarantine view, not abort the build (reference retries +
  * FAIL_LIST.csv, `build_efile_database_functions.R:5047-5101`).
  */
class QuarantineSpec extends SparkSpec {

  test("corrupt XML quarantines; good docs still build; typed index reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft-quarantine").toFile
    def put(name: String, body: String): Unit =
      java.nio.file.Files.writeString(new java.io.File(dir, name).toPath, body)
    put("good_public.xml",
      EngineBench.synthDoc("300000001", post2013 = true, ez = false, 5000L, 1, 1))
    put("truncated_public.xml",
      "<?xml version=\"1.0\"?><Return><ReturnHeader><Filer><EIN>300000002")

    // explicit schema: PERMISSIVE mode + _corrupt_record column
    val schema = SchemaBuild.sparseSchema(Nil,
      SchemaBuild.headerPaths ++ Core.declaredPaths)
    // cache: Spark disallows querying ONLY _corrupt_record off a raw
    // file scan (Pipeline.build persists the parse for the same reason)
    val parsed = Ingest.readReturns(spark, dir.getPath, Some(schema)).cache()
    assert(parsed.count() == 2)
    val failedUrls = Ingest.failed(parsed).collect().map(_.getString(0))
    assert(failedUrls.length == 1 && failedUrls.head.contains("truncated"))

    val core = Core.build(parsed.filter(org.apache.spark.sql.functions.col("_corrupt_record").isNull))
    val rows = core.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("EIN") == "300000001")
  }

  test("failList returns the INDEX ROWS of quarantined docs (reference FAIL_LIST shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-faillist").toFile
    def put(name: String, body: String): Unit =
      java.nio.file.Files.writeString(new java.io.File(dir, name).toPath, body)
    put("201400000000000001_public.xml",
      EngineBench.synthDoc("310000001", post2013 = true, ez = false, 5000L, 1, 1))
    put("201400000000000002_public.xml",
      "<?xml version=\"1.0\"?><Return><ReturnHeader><Filer><EIN>310000002")
    val idxDir = java.nio.file.Files.createTempDirectory("graft-faillist-idx").toFile
    java.nio.file.Files.writeString(new java.io.File(idxDir, "index_2015.json").toPath,
      """[{"EIN":"310000001","TaxPeriod":"201412","FormType":"990","URL":"https://s3/201400000000000001_public.xml","OrganizationName":"GOOD ORG","ObjectId":"201400000000000001"},
        |{"EIN":"310000002","TaxPeriod":"201412","FormType":"990","URL":"https://s3/201400000000000002_public.xml","OrganizationName":"BAD ORG","ObjectId":"201400000000000002"},
        |{"EIN":"310000003","TaxPeriod":"201412","FormType":"990","URL":"https://s3/201400000000000003_public.xml","OrganizationName":"ABSENT ORG","ObjectId":"201400000000000003"}]""".stripMargin)

    val schema = SchemaBuild.sparseSchema(Nil,
      SchemaBuild.headerPaths ++ Core.declaredPaths)
    val parsed = Ingest.readReturns(spark, dir.getPath, Some(schema)).cache()
    val index = Ingest.readIndex(spark, idxDir.getPath + "/index_2015.json")

    val fl = Ingest.failList(index, Ingest.failed(parsed))
    val rows = fl.collect()
    // exactly the failed doc's index row, with its full metadata —
    // not the clean doc, not the index entry with no local file
    assert(rows.length == 1, rows.mkString(";"))
    val r = rows.head
    assert(r.getAs[String]("EIN") == "310000002")
    assert(r.getAs[String]("OrganizationName") == "BAD ORG")
    assert(r.getAs[String]("FormType") == "990")
    assert(fl.columns.toSet == index.columns.toSet, "FAIL_LIST rows are index rows verbatim")
    // the semi join must broadcast the (tiny) quarantine side
    val plan = fl.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
  }

  test("readIndexTyped yields a typed Dataset with derived TaxYear") {
    val dir = java.nio.file.Files.createTempDirectory("graft-index-typed").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "index_2015.json").toPath,
      """[{"EIN":"1","TaxPeriod":"201506","FormType":"990","URL":"u","OrganizationName":"A","ObjectId":"o1"}]""")
    val ds: org.apache.spark.sql.Dataset[IndexEntry] =
      Ingest.readIndexTyped(spark, dir.getPath + "/index_2015.json")
    val e = ds.head()
    assert(e.EIN == "1" && e.TaxYear == 2014 && e.DLN == null)
  }
}
