package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge learning (Sennrich et al. 2016) — the
  * vocabulary-construction step of tokenizer prep, distributed.
  *
  * Classic word-level BPE: represent each DISTINCT word as its symbol
  * sequence (initially characters), then repeatedly (a) count adjacent
  * symbol pairs weighted by word frequency, (b) merge the most frequent
  * pair corpus-wide. The learned artifact is the ordered merge list.
  *
  * Scale shape (the reason this is k small jobs, not a driver loop over
  * the corpus): the iteration state is the DISTINCT-WORD table — one
  * row per word type with its corpus frequency — which is vocabulary-
  * sized (≪ corpus; bounded by the same argument as t15's vocab build),
  * never the token stream. Each round is
  *   1. one partial-aggregated shuffle for pair counts (explode of
  *      adjacent pairs, ~1 row per symbol — linear);
  *   2. a 1-row argmax collect to the driver — the merge IS the model,
  *      the same driver-side-model pattern as IvfIndex's centroids;
  *   3. a map-only fold applying the merge to every word's symbol
  *      array (greedy left-to-right, non-overlapping — standard BPE
  *      apply), with `localCheckpoint` truncating the per-round
  *      lineage exactly like PageRank/DupComponents.
  * The corpus itself is scanned ONCE (the word-frequency aggregation).
  *
  * Determinism: counts are integers and the argmax tie-breaks on
  * (count DESC, left ASC, right ASC), so the merge sequence is
  * bit-reproducible cross-engine — an ITERATIVE algorithm under the
  * exact-hash oracle gate, like the fixed-point PageRank (d7).
  *
  * Simplification vs production BPE (documented): no end-of-word
  * marker symbol and no byte fallback — both change only the initial
  * alphabet, not the recurrence under test.
  *
  * Reference behavior: tokenizer-prep counterpart of the reference's
  * vocabulary work (see SURVEY §2.10 extensions); no analogue in
  * `build_efile_database_functions.R` — this is LLM-pipeline surface.
  */
object BpeTrainer {

  /** Learn `k` merges from `docs(textCol)`. Returns one row per merge:
    * (step, left_sym, right_sym, pair_count), ordered by step.
    */
  def learnMerges(spark: SparkSession, docs: DataFrame, textCol: String, k: Int): DataFrame = {
    import spark.implicits._

    val wf = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("f"))
      // Spark's split on "" appends a trailing "" (Java split limit -1);
      // drop empties so the symbol array is exactly the characters
      .select(filter(split(col("word"), ""), s => length(s) > 0).as("w"), col("f"))

    var words = wf.localCheckpoint(eager = true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (step <- 1 to k) {
      val top = pairCounts(words)
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      require(top.nonEmpty, s"corpus exhausted at merge $step")
      val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((step, a, b, c))
      val next = words.select(applyMerge(col("w"), a, b).as("w"), col("f"))
      val prev = words
      words = next.localCheckpoint(eager = true)
      prev.unpersist(blocking = false)
    }
    words.unpersist(blocking = false)
    merges.result()
      .toDF("step", "left_sym", "right_sym", "pair_count")
  }

  /** Adjacent-pair counts weighted by word frequency: one linear
    * Generate (~1 pair per symbol) + one partial-agg shuffle.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("w")) >= 2)
      .select(col("w"), col("f"), explode(sequence(lit(1), size(col("w")) - 1)).as("j"))
      .select(element_at(col("w"), col("j")).as("a"),
        element_at(col("w"), col("j") + 1).as("b"), col("f"))
      .groupBy("a", "b").agg(sum(col("f")).as("c"))

  /** Greedy left-to-right non-overlapping application of merge (a, b)
    * to a symbol array — a linear fold: keep the last emitted symbol;
    * when (last, current) == (a, b), replace last with the merged
    * symbol. Pure Column algebra (stays in codegen), no UDF.
    */
  private def applyMerge(w: Column, a: String, b: String): Column = {
    val folded = aggregate(
      slice(w, lit(2), greatest(size(w) - 1, lit(0))),
      array(element_at(w, 1)),
      (acc, cur) =>
        when(element_at(acc, -1) === lit(a) && cur === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(cur))))
    when(size(w) < 2, w).otherwise(folded)
  }
}
