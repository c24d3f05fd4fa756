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
