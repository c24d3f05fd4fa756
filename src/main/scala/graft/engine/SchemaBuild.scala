package graft.engine

import org.apache.spark.sql.types._

/** Sparse document-schema synthesis (SURVEY §4 "subtree pruning"): the
  * concordance names every xpath the extraction will ever read, so the
  * XML scan can parse ONLY those subtrees. The reference gets this for
  * free (xpath evaluation ignores the rest of the DOM); a schema-first
  * parser must be told — passing this schema to `Ingest.readReturns`
  * is the difference between parsing ~40 fields and inferring/parsing
  * thousands per document at corpus scale.
  *
  * Rules: every leaf is StringType (stringly-typed parity layer,
  * SURVEY §1.2); attributes become spark-xml `_attr` fields; the
  * repeating-group prefixes of MANY-cardinality tables become
  * `ArrayType(StructType)` so single-occurrence documents still parse
  * as one-element arrays.
  *
  * Duplicate-scalar policy (SURVEY §7 "take first match for
  * declared-ONE fields, log violations"): a scalar-declared leaf makes
  * Spark's parser keep the LAST occurrence when a malformed document
  * repeats the element. The identity fields every table keys on
  * (`dupGuardPaths`, default = the header paths) are therefore
  * declared `ArrayType(StringType)`: the parser collects occurrences
  * in document order, `Extract.asScalar` takes element 1 (first
  * match — the R reference's xpath order), and
  * [[Ingest.duplicateScalars]] reports the violating documents. The
  * reference itself guards only DOMICILE/FILINGSTATES
  * (`build_efile_database_functions.R:528,1821`); payload fields keep
  * the cheap scalar parse.
  */
object SchemaBuild {

  private sealed trait Node
  private final class Branch(val children: scala.collection.mutable.LinkedHashMap[String, Node],
                             var isArray: Boolean) extends Node
  private case object Leaf extends Node
  private case object GuardedLeaf extends Node

  def sparseSchema(entries: Seq[ConcordanceEntry],
                   extraPaths: Seq[String] = headerPaths,
                   dupGuardPaths: Seq[String] = headerPaths): StructType = {
    val groupPrefixes: Set[Seq[String]] =
      entries.filter(_.cardinality == "MANY").map(_.rdbTable).distinct
        .flatMap(t => Concordance.groupPaths(entries, t)).toSet
    val guarded: Set[Seq[String]] = dupGuardPaths.map(Extract.toSegments).toSet

    val root = new Branch(scala.collection.mutable.LinkedHashMap.empty, isArray = false)

    def insert(segments: Seq[String]): Unit = {
      var node = root
      var prefix = Vector.empty[String]
      segments.zipWithIndex.foreach { case (seg, i) =>
        prefix :+= seg
        val name = if (seg.startsWith("@")) "_" + seg.stripPrefix("@") else seg
        if (i == segments.length - 1) {
          val leaf = if (guarded.contains(segments)) GuardedLeaf else Leaf
          // a guarded insert upgrades a plain leaf, never downgrades
          if (!node.children.contains(name) || (leaf == GuardedLeaf &&
              node.children(name) == Leaf)) node.children(name) = leaf
        } else {
          val child = node.children.get(name) match {
            case Some(b: Branch) => b
            case _ =>
              val b = new Branch(scala.collection.mutable.LinkedHashMap.empty, isArray = false)
              node.children(name) = b
              b
          }
          if (groupPrefixes.contains(prefix)) child.isArray = true
          node = child
        }
      }
    }

    (entries.map(_.segments) ++ extraPaths.map(Extract.toSegments)).foreach(insert)

    def render(n: Node): DataType = n match {
      case Leaf => StringType
      case GuardedLeaf => ArrayType(StringType, containsNull = true)
      case b: Branch =>
        val st = StructType(b.children.toSeq.map { case (name, child) =>
          StructField(name, render(child), nullable = true)
        })
        if (b.isArray) ArrayType(st, containsNull = true) else st
    }
    render(root).asInstanceOf[StructType]
  }

  /** Header paths every table's key columns need (TableBuild.headerCols). */
  val headerPaths: Seq[String] = Seq(
    "/Return/ReturnHeader/Filer/EIN",
    "/Return/ReturnHeader/Filer/BusinessName/BusinessNameLine1Txt",
    "/Return/ReturnHeader/Filer/BusinessName/BusinessNameLine1",
    "/Return/ReturnHeader/Filer/Name/BusinessNameLine1",
    "/Return/ReturnHeader/TaxPeriodEndDt",
    "/Return/ReturnHeader/TaxPeriodEndDate",
    "/Return/ReturnHeader/ReturnTypeCd",
    "/Return/ReturnHeader/ReturnType")
}
