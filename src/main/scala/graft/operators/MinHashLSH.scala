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

  /** Signature table: (id, shingles, sig array).
    *
    * Each shingle string is hashed ONCE to a long; the per-band hash
    * family then re-hashes that 8-byte long (`h_i = xxhash64(h, i)`)
    * instead of re-hashing the full string numHashes times — same
    * min-wise family quality at a fraction of the byte-hashing cost.
    */
  def signatures(docs: DataFrame, textCol: String, idCol: String,
                 numHashes: Int, shingleSize: Int): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val sig: Column = array(
      (0 until numHashes).map { i =>
        array_min(transform(col("hs"), h => xxhash64(h, lit(i))))
      }: _*)
    docs.select(col(idCol).as("id"),
        TextFunctions.shingleHashes(toks, shingleSize).as("hs"))
      .withColumn("sig", sig)
  }

  /** Near-duplicate pairs (id_a < id_b) with exact Jaccard >= threshold,
    * candidate-filtered through `bands` LSH bands of numHashes/bands rows.
    */
  def nearDuplicates(docs: DataFrame, textCol: String, idCol: String,
                     numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
                     jaccardThreshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands

    // signature table feeds both the banding pass and the verify join:
    // persist so the shingle+minhash computation runs once, not three
    // times (at cluster scale this is a checkpointed intermediate)
    val sigs = signatures(docs, textCol, idCol, numHashes, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // band rows: (id, shingle-set size, band_id, band_hash)
    val banded = sigs.select(
      col("id"), size(col("hs")).as("n"),
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
    // are negligible at corpus scale)
    val sets = sigs.select(col("id"), col("hs").as("shingles"))
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    candidates
      .join(sets.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }
}
