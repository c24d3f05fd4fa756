package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-byte pin of the CSV parity export (S4): `Emit.exportCsv`
  * must reproduce R `write.csv` output exactly — quoted strings with
  * embedded quotes DOUBLED (not backslash-escaped), NULL as the bare
  * unquoted token `NA` (distinct from the quoted literal string "NA"),
  * unquoted numerics, quoted header. These are the bytes the
  * reference's published CSVs carry, so a consumer diffing our export
  * against theirs must see no format noise.
  */
class EmitCsvSpec extends SparkSpec {
  import spark.implicits._

  test("exportCsv emits R write.csv bytes: quoting, doubling, bare NA, header") {
    val df = Seq(
      ("1", "plain", "500000"),
      ("2", null, "0"),
      ("3", "NA", "42"),
      ("4", "", "7"),
      ("5", "has,comma", "8"),
      ("6", "has\"quote", "9"),
      ("7", "SMITH & JONES", null)
    ).toDF("EIN", "NAME", "GROSS")
      .withColumn("N", col("GROSS").cast("long"))

    val dir = java.nio.file.Files.createTempDirectory("graft-emit-csv").toFile.getPath
    Emit.exportCsv(df.coalesce(1), dir, "core")

    val part = new java.io.File(s"$dir/core.csv").listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val lines = scala.io.Source.fromFile(part, "UTF-8").getLines().toVector

    assert(lines == Vector(
      "\"EIN\",\"NAME\",\"GROSS\",\"N\"",
      "\"1\",\"plain\",\"500000\",500000",
      "\"2\",NA,\"0\",0",                     // NULL → bare NA, even mid-strings
      "\"3\",\"NA\",\"42\",42",               // literal string "NA" stays quoted
      "\"4\",\"\",\"7\",7",                   // present-but-empty stays ""
      "\"5\",\"has,comma\",\"8\",8",          // delimiter inside quotes, no re-quote
      "\"6\",\"has\"\"quote\",\"9\",9",       // quote DOUBLING, not backslash
      "\"7\",\"SMITH & JONES\",NA,NA"         // NULL in string and numeric columns
    ), lines.mkString("\n"))
  }

  test("exportCsv is partition-parallel: every part file carries the header") {
    val df = (1 to 8).map(i => (i.toString, s"ORG $i")).toDF("EIN", "NAME")
    val dir = java.nio.file.Files.createTempDirectory("graft-emit-csv-p").toFile.getPath
    Emit.exportCsv(df.repartition(4), dir, "chunked")
    val parts = new java.io.File(s"$dir/chunked.csv").listFiles()
      .filter(_.getName.endsWith(".csv")).sortBy(_.getName)
    assert(parts.length == 4)
    val all = parts.toVector.flatMap { p =>
      val ls = scala.io.Source.fromFile(p, "UTF-8").getLines().toVector
      assert(ls.head == "\"EIN\",\"NAME\"", s"part ${p.getName} header: ${ls.headOption}")
      ls.tail
    }
    assert(all.toSet == (1 to 8).map(i => s""""$i","ORG $i"""").toSet)
  }

  test("exportCsv of an EMPTY table writes the header line, like R write.csv") {
    val df = Seq.empty[(String, String)].toDF("EIN", "NAME")
    val dir = java.nio.file.Files.createTempDirectory("graft-emit-csv-e").toFile.getPath
    Emit.exportCsv(df, dir, "empty")
    val parts = new java.io.File(s"$dir/empty.csv").listFiles()
      .filter(_.getName.endsWith(".csv"))
    assert(parts.nonEmpty, "an empty table must still produce a header file")
    val lines = parts.toVector.flatMap(p =>
      scala.io.Source.fromFile(p, "UTF-8").getLines().toVector)
    assert(lines == Vector("\"EIN\",\"NAME\""), lines.mkString("|"))
  }
}
