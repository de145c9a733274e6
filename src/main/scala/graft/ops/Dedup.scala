package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-corpus pipelines (north star: "dedup" —
  * /root/repo/BASELINE.json; no analogue in the reference, which holds 239
  * rows in RAM — SURVEY §2.9 X2/X3).
  *
  * Scale design:
  *  - Exact dedup = hash-groupBy: one shuffle on a 16-byte digest, never on
  *    the document text. At 100 TB the shuffle carries ~1% of input bytes.
  *  - MinHash/LSH near-dup = signature → band → bucket self-join: candidate
  *    generation touches only (doc_id, band_key) pairs, shuffled by band key,
  *    so the quadratic all-pairs compare is confined to LSH buckets. The
  *    exact-Jaccard verify then runs per candidate pair.
  *  - All hashing is md5 (portable, identical in any engine) via codegen'd
  *    higher-order functions — no UDFs, no driver-side loops.
  *
  * Every function here is mirrored 1:1 by ANSI SQL in `SparkEntry.oracleSql`
  * so the driver's DuckDB oracle verifies candidate generation AND the final
  * verified pairs, not just row counts.
  */
object Dedup {

  /** Exact dedup: canonical survivor (min id) per content digest.
    * SURVEY X2: `dropDuplicates` semantics but deterministic, and grouping on
    * the digest keeps shuffle width constant regardless of document size.
    */
  def exactByContent(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  // ---------------------------------------------------------------- MinHash

  /** MinHash signature of a token set: for seed s, min over tokens of
    * md5(s:token). Lexicographic min over hex digests is a valid uniform
    * permutation proxy (any total order on a uniform hash works), and —
    * unlike murmur3 — md5 is bit-identical in every engine, so the oracle
    * can recompute signatures. Nested higher-order functions: the outer
    * `transform` runs per seed, the inner per token; all codegen, no shuffle.
    */
  def minHashSignature(tokenSet: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(tokenSet,
        t => md5(concat(s.cast("string"), lit(":"), t).cast("binary")))))

  /** LSH band keys: signature split into `bands` rows of `rowsPerBand`,
    * each band hashed to one key. Docs sharing any band key are candidates.
    */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        md5(concat_ws("|", slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)))
          .cast("binary")).as("band_key")))

  /** Exact Jaccard similarity of two token-set columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Near-duplicate pairs via MinHash + LSH over 3-gram shingle sets,
    * verified with exact Jaccard.
    *
    * Shingling matters: on a small shared vocabulary, TOKEN-set Jaccard is
    * non-discriminative (most doc pairs overlap heavily); n-gram shingles
    * encode local order and separate true near-dups from topical overlap.
    *
    * Plan shape (the part that must survive 100 TB):
    *   1. per-doc signature + band keys — narrow, codegen, no shuffle;
    *   2. explode band keys → self-equi-join on (band, band_key) — ONE
    *      shuffle keyed by a 16-byte band key; bucket sizes are the only
    *      quadratic term and LSH keeps them small;
    *   3. distinct candidate pairs → join back to shingle sets → exact
    *      Jaccard filter.
    * Returns (doc_a, doc_b, jaccard) with jaccard rounded to 4dp.
    * Defaults (16 hashes, 8 bands × 2) catch j=0.5 pairs w.p. ~0.90 and
    * j≥0.7 w.p. ~0.995.
    */
  def minHashNearDupPairs(docs: DataFrame, threshold: Double,
                          numHashes: Int = 16, bands: Int = 8,
                          shingleSize: Int = 3,
                          idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")
    val toks = docs.select(col(idCol).as("id"),
      shingles(col(textCol), shingleSize).as("ts"))
    val banded = toks
      .withColumn("sig", minHashSignature(col("ts"), numHashes))
      .select(col("id"), explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j"))
      .distinct()
    cand
      .join(toks.select(col("id").as("i"), col("ts").as("ts_a")), "i")
      .join(toks.select(col("id").as("j"), col("ts").as("ts_b")), "j")
      .select(col("i").as("doc_a"), col("j").as("doc_b"),
        round(jaccard(col("ts_a"), col("ts_b")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---------------------------------------------------------------- SimHash

  /** 32-bit SimHash fingerprint as a '0'/'1' string. Bit i is the sign of
    * Σ_tokens (±1), where the ±1 is the high bit of the i-th hex nibble of
    * md5(token). One md5 per token (precomputed), then 32 codegen'd folds —
    * per-row work only, embarrassingly parallel.
    */
  def simHashBits(tokenSet: Column): Column = {
    val hashes = transform(tokenSet, t => md5(t.cast("binary")))
    array_join(
      transform(sequence(lit(1), lit(32)), i =>
        when(aggregate(hashes, lit(0L),
          (acc, h) => acc + when(h.substr(i, lit(1)) >= "8", 1L).otherwise(-1L)) > 0,
          lit("1")).otherwise(lit("0"))), "")
  }

  /** Hamming distance between two equal-length bit strings. */
  def hammingDistance(a: Column, b: Column): Column =
    aggregate(zip_with(split(a, ""), split(b, ""), (x, y) => when(x =!= y, 1L).otherwise(0L)),
      lit(0L), _ + _)

  // ------------------------------------------------------- n-gram Jaccard

  /** Token n-gram (shingle) set of a text column — distinct, sorted.
    * Guarded: texts shorter than n tokens yield an EMPTY set (Spark's
    * `sequence(1, 0)` would count DOWN, not produce nothing).
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = Text.tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_sort(array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n)))))))
  }

  /** Exact n-gram-Jaccard near-dup pairs with min-token blocking: candidate
    * pairs must share language AND the lexicographically smallest token
    * (prefix-filtering — a PPJoin-style block that turns the O(n²) scan into
    * a self-equi-join; one shuffle on the block key).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, threshold: Double): DataFrame = {
    val t = docs.select(col("doc_id").as("id"), col("lang"),
      Text.tokenSet(col("text")).as("ts"), shingles(col("text"), n).as("sh"))
      .withColumn("blk", col("ts").getItem(0))
    t.as("a").join(t.as("b"),
        col("a.lang") === col("b.lang") && col("a.blk") === col("b.blk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"),
        round(jaccard(col("a.sh"), col("b.sh")), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
