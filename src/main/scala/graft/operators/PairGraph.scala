package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence pair generation, aggregate-before-join (r6
  * optimization, guide §3/§2.4 "explode after the join key, not
  * before"): the r5-era build of every co-purchase edge list was
  *
  *   distinct(group, item) self-joined on `group` with item_a < item_b
  *
  * whose physical plan pays one exchange for the distinct AND two more
  * full-width exchanges + a sort-merge join on the group key — four
  * data-wide exchanges before the pair aggregation. But a pair list is
  * a per-GROUP computation: collecting each group's distinct item set
  * in ONE exchange (partial collect_set runs map-side) and exploding
  * the C(n,2) ordered pairs of the sorted array produces the exact
  * same (group, src, dst) multiset — src < dst from the sort — with
  * two exchanges total and no join. Basket sizes bound the explode
  * exactly as they bounded the self-join output, so the shape is safe
  * at any scale the self-join was.
  */
object PairGraph {

  /** One row per (group, unordered item pair): columns `groupCol`,
    * `src`, `dst` with src < dst, items deduplicated within a group.
    * Equivalent to
    * `distinct(df) a JOIN distinct(df) b ON a.group = b.group AND
    * a.item < b.item` — proven bit-exact by each consumer's oracle.
    */
  def groupPairs(df: DataFrame, groupCol: String, itemCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
      .select(col(groupCol), explode(expr(
        "flatten(transform(__items, (x, i) -> " +
          "transform(slice(__items, i + 2, size(__items)), " +
          "y -> named_struct('src', x, 'dst', y))))")).as("__pr"))
      .select(col(groupCol), col("__pr.src").as("src"), col("__pr.dst").as("dst"))
}
