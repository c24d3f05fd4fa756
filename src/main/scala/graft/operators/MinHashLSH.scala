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

  /** PORTABLE hash family — every value representable and computable
    * identically in plain 64-bit integer SQL, which is what lets the
    * d3 banding run under the DuckDB hash gate (the same move that put
    * d13's sign-LSH under it): shingle ids are the first 60 bits of
    * md5(shingle string) reduced mod P = 2^31 − 1, the per-row family
    * is h_i(x) = (a_i·x + b_i) mod P with LCG-derived a_i, b_i, and
    * the band hash is a (·K + v) mod P fold — max intermediate
    * 2^31·2^31 = 2^62, so everything stays in exact BIGINT range on
    * ANY engine. 31-bit min-hash values are ample for min-wise
    * estimation at corpus scale (collision odds per shingle pair
    * 2^-31); the xxhash64 family (default) remains the cheaper choice
    * when cross-engine verifiability isn't required.
    */
  private val P = 2147483647L // 2^31 - 1
  private val BandK = 1048573L
  private def aI(i: Int): Long = (1664525L * (i + 1) + 1013904223L) % P
  private def bI(i: Int): Long = (22695477L * (i + 1) + 1L) % P

  /** w-token shingle STRINGS (space-joined, whole text when fewer
    * than w tokens — the d12 rule), pre-distincted. String building
    * stays in (interpreted) array lambdas; the md5 hashing is kept
    * OUT of them deliberately — see [[portableHashedSets]].
    */
  private def shingleStrings(toks: Column, w: Int): Column = {
    val n = size(toks)
    val m = n - lit(w - 1)
    val parts = (1 to w).map(k => slice(toks, lit(k), m))
    val strings = parts.reduce((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    array_distinct(when(n >= w, strings).otherwise(array(concat_ws(" ", toks))))
  }

  /** (id, shingles: distinct portable shingle ids) — md5 → first 15
    * hex chars → BIGINT → mod P. The hash runs on an EXPLODED flat
    * column, not inside a higher-order lambda: HOF lambdas execute
    * interpreted (the t81 lesson), and md5+conv per element is exactly
    * the work that must stay in whole-stage codegen. collect_set
    * dedups AFTER hashing, matching the oracle's list_distinct over
    * hashed values bit-for-bit even on mod-P collisions.
    */
  def portableHashedSets(docs: DataFrame, textCol: String, idCol: String,
                         shingleSize: Int): DataFrame =
    // keyed repartition BEFORE the heavy projection: a small corpus can
    // sit in one parquet row group (single-task scan — the t81 lesson),
    // which would serialize the whole md5/shingle pass onto one core;
    // shuffling raw text is trivial relative to hashing it, and at real
    // scale the scan is already wide so this is a cheap no-op
    docs.repartition(col(idCol))
      .select(col(idCol).as("id"),
        explode(shingleStrings(TextFunctions.tokens(col(textCol)), shingleSize)).as("s"))
      .select(col("id"),
        (conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long") % P).as("h"))
      .groupBy(col("id"))
      .agg(collect_set(col("h")).as("shingles"))

  /** [[signatures]] twin over a PRE-HASHED set table (id, shingles).
    * The md5 pass is ~3× the xxhash64 family's cost, so the portable
    * path hashes once into a persisted set table and derives both the
    * signatures and the verify join from it.
    */
  def portableSignatures(hashedSets: DataFrame, numHashes: Int): DataFrame =
    hashedSets.select(col("id"), explode(col("shingles")).as("h"))
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("int").as("n"),
        (0 until numHashes).map(i =>
          min((col("h") * lit(aI(i)) + lit(bI(i))) % lit(P)).as(s"m$i")): _*)
      .select(col("id"), col("n"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))

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
                     jaccardThreshold: Double = 0.5,
                     portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands

    // the portable family pays one md5 pass — hash ONCE into a
    // persisted set table (~8·|S| bytes per doc) reused by both the
    // signature derivation and the verify join; the xxhash64 family
    // recomputes instead (cache write costs more than its compute)
    val hashedSets =
      if (portable)
        Some(portableHashedSets(docs, textCol, idCol, shingleSize)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
      else None

    // signature rows are TINY (numHashes longs + 2 scalars per doc), so
    // persisting them is ~1 MB per 5k docs — that one small cache keeps
    // the band self-join from running the shingle pipeline twice
    val sigs = hashedSets.map(portableSignatures(_, numHashes))
      .getOrElse(signatures(docs, textCol, idCol, numHashes, shingleSize))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // band rows: (id, shingle-set size, band_id, band_hash)
    val bandHash: Column => Column =
      if (portable) sl => aggregate(sl, lit(0L), (acc, v) => (acc * lit(BandK) + v) % lit(P))
      else sl => xxhash64(sl)
    val banded = sigs.select(
      col("id"), col("n"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        j => bandHash(slice(col("sig"), j * rows + 1, lit(rows))))).as(Seq("band_id", "band_hash")))

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
    // shuffle ~10× lighter than shingle strings; hash collisions are
    // negligible at corpus scale) — re-derived from the raw text, not
    // read back from a cached signature table. The portable run must
    // verify over the SAME hashed sets the oracle computes, so the
    // family choice carries through.
    val sets = hashedSets.getOrElse(
      docs.select(col(idCol).as("id"),
        TextFunctions.shingleHashes(TextFunctions.tokens(col(textCol)), shingleSize)
          .as("shingles")))
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    candidates
      .join(sets.select(col("id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sets.select(col("id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"), jac.as("jaccard"))
      .filter(col("jaccard") >= jaccardThreshold)
  }
}
