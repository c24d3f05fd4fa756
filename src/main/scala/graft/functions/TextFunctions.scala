package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives used by the training-data pipeline operators.
  * All pure `Column` algebra (codegen'd) — no UDFs, so they stay inside
  * whole-stage codegen over the scan at any scale.
  */
object TextFunctions {

  /** Count of regex matches in a string column. */
  def regexCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("int")

  /** Whitespace-delimited token count. */
  def tokenCount(text: Column): Column = regexCount(text, "\\S+")

  /** Lower-cased whitespace tokens, with NO empty tokens — the exact
    * twin of the oracle's `regexp_extract_all(lower(text), '\S+')`.
    * (`split` on `\s+` emits a leading "" token for text with leading
    * whitespace and [""] for empty text, silently skewing counts and
    * vocabularies on any corpus that isn't single-space-normalized.)
    */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\S+"), lit(0))

  /** BPE-style pre-tokenization count: letter runs, digit runs, and
    * individual other marks count as separate tokens — a cheap,
    * deterministic proxy for subword-tokenizer budgeting (the pattern
    * mirrors GPT-2-ish pre-tokenization word splitting).
    */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column = regexCount(text, BpePattern)

  /** Distinct word w-shingles (space-joined) of the token array; if the
    * document is shorter than `w` tokens, the whole document is the one
    * shingle.
    */
  def wordShingles(toks: Column, w: Int): Column = {
    val n = size(toks)
    array_distinct(
      when(n >= w,
        transform(sequence(lit(0), n - w), i => concat_ws(" ", slice(toks, i + 1, lit(w)))))
        .otherwise(array(concat_ws(" ", toks))))
  }

  /** Distinct hashes of word w-shingles WITHOUT materializing shingle
    * strings: tokens are hashed once, then each shingle hash mixes the
    * w consecutive token hashes (`xxhash64(h_i, ..., h_{i+w-1})`).
    * Equivalent set semantics to hashing [[wordShingles]] output
    * (collisions negligible), at a fraction of the allocation cost —
    * the hot path of MinHash signatures over a corpus.
    */
  def shingleHashes(toks: Column, w: Int): Column = {
    val th = transform(toks, t => xxhash64(t))
    val n = size(toks)
    val m = n - lit(w - 1)
    // w aligned slices of the token-hash array, folded pairwise with
    // zip_with — strictly linear. (An element_at(th, i+k) formulation
    // re-evaluates the whole token-hash pass per shingle: O(n²).)
    val parts = (1 to w).map(k => slice(th, lit(k), m))
    val combined = parts.reduce((a, b) => zip_with(a, b, (x, y) => xxhash64(x, y)))
    array_distinct(
      when(n >= w, combined)
        .otherwise(array(xxhash64(concat_ws(" ", toks)))))
  }

  /** Logit of the t12 quality classifier: fixed CCNet-style linear
    * model over (token count, avg token length, stopword ratio). Op
    * order is pinned — an oracle mirrors it term by term.
    */
  def qualityLogit(text: Column): Column = {
    val nt = tokenCount(text).cast("double")
    val atl = length(regexp_replace(text, " ", "")).cast("double") / nt
    val sw = size(filter(split(text, " "), w => w.isin("the", "a"))).cast("double") / nt
    lit(-1.5) + lit(0.02) * nt + lit(0.8) * sw - lit(0.1) * atl
  }

  /** Sigmoid quality score rounded to 6 dp (absorbs exp's 1-ulp libm
    * divergence; downstream ranking/thresholding must use THIS rounded
    * value so both engines order ties identically).
    */
  def qualityScore6(text: Column): Column =
    round(lit(1.0) / (lit(1.0) + exp(-qualityLogit(text))), 6)

  /** Polynomial rolling hash over the characters of a string:
    * `h = fold(0, (acc, ch) -> (acc*31 + codepoint(ch)) mod 1_000_000_007)`.
    * Order-sensitive document fingerprint (reference-style content
    * identity without storing the text). Modulus keeps the accumulator
    * within Long range (no ANSI overflow).
    *
    * Implemented by the native codegen'd [[RollingHash]] (in-place
    * string walk); [[rollingFingerprintComposed]] is the built-in
    * formulation it is pinned against (same fold, same hashes — but
    * one single-char UTF8String allocation per character per row).
    */
  def rollingFingerprint(text: Column): Column =
    RollingHash.rollhashNative(text)

  /** The pre-native composed formulation (kept for the equality spec
    * and as the no-extensions fallback).
    */
  def rollingFingerprintComposed(text: Column): Column =
    aggregate(
      split(text, ""),
      lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch).cast("long")) % 1000000007L)
}
