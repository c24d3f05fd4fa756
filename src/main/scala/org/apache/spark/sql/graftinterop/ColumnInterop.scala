package org.apache.spark.sql.graftinterop

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{SortOrder => SortNode}

/** Column-internals bridge.
  *
  * Spark 4 split `Column` off its Catalyst expression (the sql-api
  * refactor): the public surface carries an opaque `ColumnNode` and
  * everything that inspects it is private[sql]. graft's operator layer
  * sometimes needs one structural fact — whether a caller's ordering
  * column is `.asc` or `.desc`, and its null ordering — e.g.
  * [[graft.operators.ShardedRank]] builds deterministic shard-boundary
  * predicates from the order key and must honor the sort direction.
  * This object lives under `org.apache.spark.sql` solely to read that
  * off the node; no behavior is added.
  */
object ColumnInterop {

  /** (key column, ascending, nullsFirst) from a possibly
    * `.asc`/`.desc`-wrapped ordering Column. A bare column sorts
    * ascending with Spark's default NULLS FIRST.
    */
  def parseOrder(c: Column): (Column, Boolean, Boolean) = c.node match {
    case so: SortNode =>
      (Column(so.child),
        so.sortDirection == SortNode.Ascending,
        so.nullOrdering == SortNode.NullsFirst)
    case _ => (c, true, true)
  }
}
