package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.types._

class SchemaBuildSpec extends SparkSpec {

  private def e(v: String, x: String, card: String, table: String) =
    ConcordanceEntry(v, x, "text", card, table, "PC", Nil, None)

  private val mini = Seq(
    e("GROSSRECEIPTS", "/Return/ReturnData/IRS990/GrossReceiptsAmt", "ONE", "CORE"),
    e("GROSSRECEIPTS", "/Return/ReturnData/IRS990/GrossReceipts", "ONE", "CORE"),
    e("DTK_NAME", "/Return/ReturnData/IRS990/Form990PartVIISectionAGrp/PersonNm", "MANY", "P7"),
    e("DTK_NAME", "/Return/ReturnData/IRS990/Form990PartVIISectionA/NamePerson", "MANY", "P7"),
    e("DTK_TITLE", "/Return/ReturnData/IRS990/Form990PartVIISectionAGrp/TitleTxt", "MANY", "P7"),
    e("DTK_TITLE", "/Return/ReturnData/IRS990/Form990PartVIISectionA/Title", "MANY", "P7"),
    e("C501", "/Return/ReturnData/IRS990/Organization501c/@typeOf501cOrganization", "ONE", "CORE"))

  test("repeating groups render as ArrayType(StructType); scalars as StringType") {
    val s = SchemaBuild.sparseSchema(mini)
    val irs990 = s("ReturnData").dataType.asInstanceOf[StructType]("IRS990")
      .dataType.asInstanceOf[StructType]
    assert(irs990("GrossReceiptsAmt").dataType == StringType)
    assert(irs990("Form990PartVIISectionAGrp").dataType.isInstanceOf[ArrayType])
    assert(irs990("Form990PartVIISectionA").dataType.isInstanceOf[ArrayType])
    val grp = irs990("Form990PartVIISectionAGrp").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(grp.fieldNames.toSet == Set("PersonNm", "TitleTxt"))
  }

  test("attributes become _attr fields") {
    val s = SchemaBuild.sparseSchema(mini)
    val org = s("ReturnData").dataType.asInstanceOf[StructType]("IRS990")
      .dataType.asInstanceOf[StructType]("Organization501c").dataType.asInstanceOf[StructType]
    assert(org.fieldNames.contains("_typeOf501cOrganization"))
  }

  test("reading fixtures with the sparse schema still extracts correctly") {
    val parsed = Ingest.readReturns(spark, getClass.getResource("/xml").getPath,
      Some(SchemaBuild.sparseSchema(mini)))
    // single-occurrence groups parse as 1-element arrays under the
    // declared ArrayType, so the 1:M builder needs no struct fallback
    val dtk = TableBuild.oneToMany(parsed, mini, "P7")
    assert(dtk.count() == 4)
    val gr = Core.build(parsed)
    // sparse schema: core slice columns that have no declared path are null
    val row = gr.filter(org.apache.spark.sql.functions.col("EIN") === "100000001").head()
    assert(row.getAs[String]("GROSSRECEIPTS") == "500000")
    assert(row.getAs[String]("NAME") == "ALPHA ARTS FOUNDATION")
  }

  test("sparse schema is narrow: only declared subtrees appear") {
    val s = SchemaBuild.sparseSchema(mini)
    val data = s("ReturnData").dataType.asInstanceOf[StructType]
    assert(data.fieldNames.toSet == Set("IRS990"), "no undeclared schedules parsed")
    val irs990 = data("IRS990").dataType.asInstanceOf[StructType]
    assert(irs990.size == 5) // 2 GR spellings collapse to distinct leaf names + 2 groups + Organization501c
  }
}
