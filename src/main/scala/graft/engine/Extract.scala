package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The metadata-driven projector (SURVEY §2.3, operators E1–E7): turns
  * concordance xpaths into Catalyst `Column`s over a parsed-XML
  * DataFrame (rowTag = `Return`).
  *
  * Reference semantics re-expressed (not ported):
  *  - E1 scalar extract (`xml_text(xml_find_all(doc, xpath))`,
  *    `build_efile_database_functions.R:307-4149`) → struct-field
  *    navigation on the parsed document
  *  - E2 version coalesce (xpath unions `a|b|c`, `:332-336,484-489`) →
  *    `coalesce(variant1, variant2, ...)`
  *  - E3 attribute extract (`:657-661`) → spark-xml `_attr` fields
  *  - E4 multi-value collapse (`:528,1821`) → `array_join(..., " ")`
  *  - R8 length-0→NA guard (`:560` etc.) → a missing path is `null`;
  *    a path absent from the corpus *schema* is `lit(null)`, so one
  *    engine runs any era's corpus without schema errors
  *  - declared-ONE fields take the FIRST match instead of silently
  *    fanning out rows (the R `data.frame` recycling quirk SURVEY §7
  *    flags as a bug to not replicate)
  *
  * Everything lands on built-in expressions — whole-stage codegen
  * compiles the synthesized projection, the runtime equivalent of the
  * reference's `create_code_chunks` static R codegen (`:5186-5291`).
  */
object Extract {

  private val AttrPrefix = "_" // spark-xml attributePrefix default

  private def fieldName(seg: String): String =
    if (seg.startsWith("@")) AttrPrefix + seg.stripPrefix("@") else seg

  /** Walk a path through the schema, returning the terminal DataType
    * and Column. Arrays along the way stay arrays (`getField` maps over
    * array-of-struct); None when the path cannot exist in this schema.
    */
  private def walk(schema: StructType, segments: Seq[String]): Option[(DataType, Column)] = {
    def step(dt: DataType, segs: Seq[String], acc: Column): Option[(DataType, Column)] =
      segs match {
        case Seq() => Some((dt, acc))
        case seg +: rest =>
          dt match {
            case st: StructType =>
              st.fields.find(_.name == fieldName(seg))
                .flatMap(f => step(f.dataType, rest, acc.getField(f.name)))
            case ArrayType(et: StructType, _) =>
              et.fields.find(_.name == fieldName(seg)).flatMap(f =>
                step(ArrayType(f.dataType), rest, acc.getField(fieldName(seg))))
            case _ => None
          }
      }
    segments match {
      case head +: rest =>
        schema.fields.find(_.name == fieldName(head))
          .flatMap(f => step(f.dataType, rest, col(f.name)))
      case _ => None
    }
  }

  /** Normalize a resolved terminal to a scalar string: struct with
    * `_VALUE` (element with attributes) → its value; array → first
    * element (declared-ONE policy); else cast to string.
    */
  private def asScalar(dt: DataType, c: Column): Column = dt match {
    case st: StructType if st.fieldNames.contains("_VALUE") =>
      c.getField("_VALUE").cast("string")
    case ArrayType(et: StructType, _) if et.fieldNames.contains("_VALUE") =>
      element_at(c, 1).getField("_VALUE").cast("string")
    case ArrayType(_, _) => element_at(c, 1).cast("string")
    case _ => c.cast("string")
  }

  /** E1+E2: canonical scalar extraction — coalesce of all era-variant
    * xpaths that exist in this corpus' schema; typed null when none do.
    */
  def scalar(df: DataFrame, xpaths: Seq[String]): Column = {
    val cols = xpaths.flatMap(x => walk(df.schema, toSegments(x)))
      .map { case (dt, c) => asScalar(dt, c) }
    cols match {
      case Seq() => lit(null).cast("string")
      case Seq(one) => one
      case many => coalesce(many: _*)
    }
  }

  /** E4: multi-value collapse — all matches joined with `sep`
    * (reference DOMICILE/FILINGSTATES `paste(collapse=" ")`).
    */
  def multiValue(df: DataFrame, xpaths: Seq[String], sep: String = " "): Column = {
    val arrays = xpaths.flatMap(x => walk(df.schema, toSegments(x))).map {
      case (ArrayType(_, _), c) => c.cast(ArrayType(StringType))
      // array(null) is a non-null array — guard so an absent scalar
      // variant yields NULL and coalesce can fall through to the next era
      case (_, c) => when(c.isNotNull, array(c.cast("string")))
    }
    // R's paste(collapse=sep) of ZERO matches is "" (never NA) — docs
    // without the element (e.g. EZ filers for DOMICILE) get "", R:528
    if (arrays.isEmpty) lit("")
    else coalesce(array_join(coalesce(arrays: _*), sep), lit(""))
  }

  /** The raw (DataType, Column) resolution — used by the 1:M table
    * builder to locate repeating-group arrays.
    */
  def resolveRaw(df: DataFrame, xpath: String): Option[(DataType, Column)] =
    walk(df.schema, toSegments(xpath))

  /** Relative scalar extraction inside an exploded group struct. */
  def relative(itemType: StructType, item: Column, relPaths: Seq[String]): Column = {
    def step(dt: DataType, segs: Seq[String], acc: Column): Option[(DataType, Column)] =
      segs match {
        case Seq() => Some((dt, acc))
        case seg +: rest => dt match {
          case st: StructType =>
            st.fields.find(_.name == fieldName(seg))
              .flatMap(f => step(f.dataType, rest, acc.getField(f.name)))
          case _ => None
        }
      }
    val cols = relPaths.flatMap { p =>
      step(itemType, p.split("/").toSeq.filter(_.nonEmpty), item)
    }.map { case (dt, c) => asScalar(dt, c) }
    cols match {
      case Seq() => lit(null).cast("string")
      case Seq(one) => one
      case many => coalesce(many: _*)
    }
  }

  def toSegments(xpath: String): Seq[String] =
    xpath.stripPrefix("//").stripPrefix("/").stripPrefix("Return/")
      .split("/").toSeq.filter(_.nonEmpty)

  /** E6: ObjectId from URL — double regexp_replace, reference `:39-44`. */
  def objectIdFromUrl(url: Column): Column =
    regexp_replace(
      regexp_replace(url, lit("^.*/"), lit("")),
      lit("_public\\.xml$"), lit(""))
}
