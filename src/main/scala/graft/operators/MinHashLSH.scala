package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** MinHash + LSH near-duplicate detection
  * (shingle → minhash signature → band → bucket-join → exact-Jaccard
  * verify), all as `Column` algebra — no UDFs, no driver-side state.
  *
  * Scale posture: the only shuffles are (1) the band-bucket self-join,
  * whose key (band_id, band_hash) is high-cardinality by construction,
  * and (2) the verify join back to the shingle sets on doc id. No O(n²)
  * cross product ever forms; pair blow-up inside one bucket is bounded
  * by bucket size, and AQE's skew handling covers pathological buckets.
  *
  * Per-band minhash h_i(shingle) = xxhash64(shingle, i); band hash is a
  * hash of the signature slice. Everything deterministic (seeded by the
  * band/hash index), so results are reproducible across runs/partitions.
  */
object MinHashLSH {

  /** Signature table: (id, n, sig array of numHashes minima).
    *
    * Each shingle string is hashed ONCE to a long; the per-band hash
    * family then re-hashes that 8-byte long (`h_i = xxhash64(h, i)`)
    * instead of re-hashing the full string numHashes times — same
    * min-wise family quality at a fraction of the byte-hashing cost.
    *
    * Shape: explode the shingle hashes and run numHashes codegen'd MIN
    * aggregates. Higher-order-function lambdas are interpreted per
    * (element × hash) — the S·numHashes hot path — while explode +
    * xxhash64 + partial min all live inside whole-stage codegen, and
    * map-side partial aggregation ships numHashes longs per document,
    * so the groupBy shuffle is signature-sized, not shingle-sized.
    */
  def signatures(docs: DataFrame, textCol: String, idCol: String,
                 numHashes: Int, shingleSize: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    // distinct first: repeated shingles add nothing to a MIN aggregate,
    // and Jaccard is a set measure — so n = |set| also tightens the
    // symmetric length prefilter
    docs.select(col(idCol).as("id"),
        explode(array_distinct(TextFunctions.shingleHashes(toks, shingleSize))).as("h"))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("int").as("n"),
        (0 until numHashes).map(i => min(xxhash64(col("h"), lit(i))).as(s"m$i")): _*)
      .select(col("id"), col("n"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Near-duplicate pairs (id_a < id_b) with exact Jaccard >= threshold,
    * candidate-filtered through `bands` LSH bands of numHashes/bands rows.
    *
    * No persist: caching the corpus-wide hashed-shingle arrays costs
    * far more than the compute they save (measured 4.3 s cache write vs
    * 0.4 s recompute at sf0.1) — and at 100 TB an S-element array per
    * document is exactly the intermediate you don't materialize. The
    * banding pass streams shingles → signature → bands in one shot; the
    * verify step re-derives shingle sets inside its candidate joins,
    * where candidates ≪ corpus.
    */
  def nearDuplicates(docs: DataFrame, textCol: String, idCol: String,
                     numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
                     jaccardThreshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands

    // signature rows are TINY (numHashes longs + 2 scalars per doc), so
    // persisting them is ~1 MB per 5k docs — that one small cache keeps
    // the band self-join from running the shingle pipeline twice
    val sigs = signatures(docs, textCol, idCol, numHashes, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // band rows: (id, shingle-set size, band_id, band_hash)
    val banded = sigs.select(
      col("id"), col("n"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        j => xxhash64(slice(col("sig"), j * rows + 1, lit(rows))))).as(Seq("band_id", "band_hash")))

    // candidate pairs from shared buckets; the symmetric length filter
    // t·|A| ≤ |B| ≤ |A|/t is implied by Jaccard ≥ t, so it only prunes
    // pairs the verify step would reject — before their shingle sets
    // ever shuffle
    val left = banded.select(col("id").as("id_a"), col("n").as("na"), col("band_id"), col("band_hash"))
    val right = banded.select(col("id").as("id_b"), col("n").as("nb"), col("band_id"), col("band_hash"))
    val candidates = left.join(right, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b")
        && col("nb") >= ceil(col("na") * lit(jaccardThreshold))
        && col("na") >= ceil(col("nb") * lit(jaccardThreshold)))
      .select("id_a", "id_b").distinct()

    // exact-Jaccard verify on the hashed shingle sets (8-byte elements
    // shuffle ~10× lighter than shingle strings; xxhash64 collisions
    // are negligible at corpus scale) — re-derived from the raw text,
    // not read back from a cached signature table
    val sets = docs.select(col(idCol).as("id"),
      TextFunctions.shingleHashes(TextFunctions.tokens(col(textCol)), shingleSize)
        .as("shingles"))
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    candidates
      .join(sets.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }
}
