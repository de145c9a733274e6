package graft.catalog

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Vectors}
import graft.tables.Tables.load

/** Session-scoped stored-index cache backing the `dedup_incremental_*_indexed`
  * bench twins. The non-indexed incremental queries necessarily rebuild the
  * corpus index from text per run (the DuckDB oracle must replay
  * construction), so their bench numbers measure index-build + probe. These
  * twins measure the STEADY STATE a production ingest loop actually runs:
  * the corpus index is built ONCE per session (here, per (session, sf-dir) —
  * `Bench` prewarms it outside the timed region), persisted to parquet, and
  * the read-back frames kept warm (MEMORY_ONLY — an ingest loop probing
  * every few minutes would hold them exactly like this; evicted blocks
  * lazily re-read parquet, never re-shingle text). The timed query then pays
  * only batch shingling + probe joins — the cost profile
  * `Dedup.minHashIncrementalIndexed`/`Vectors.cosineIncrementalIndexed`
  * exist to deliver.
  *
  * The twins use the STEADY-STATE split (2% batch vs 98% corpus —
  * documents: doc_id % 50, embeddings: vec_id % 70), where the contrast
  * against rebuild-from-text is structural, not noise: the `% 5`/`% 7`
  * splits of the original incremental queries make the batch 14-20% of the
  * corpus, so index build is a minority cost there. Each twin has a
  * rebuild-from-text sibling at the SAME split (`*_small`) so the bench
  * comparison is apples-to-apples.
  */
object StoredIndexes {

  /** Batch modulus of the steady-state split over `documents.doc_id`. */
  val DocMod = 50
  /** Batch modulus of the steady-state split over `embeddings.vec_id`. */
  val VecMod = 70

  private val built = new ConcurrentHashMap[String, (DataFrame, DataFrame)]()

  private def key(s: SparkSession, dir: String, family: String) =
    s"${System.identityHashCode(s)}|$dir|$family"

  /** Stored MinHash index frames (shingle sets, banded keys) for `dir`'s
    * steady-state corpus split, built + persisted on first use (thread-safe;
    * one build per session × dir).
    */
  def minHash(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    built.computeIfAbsent(key(s, dir, "minhash"), _ => {
      val d = java.nio.file.Files.createTempDirectory("graft-mh-index-").toString
      Dedup.writeMinHashIndex(
        load(s, dir, "documents").filter(col("doc_id") % DocMod =!= 0), d)
      val (toks, banded) = Dedup.readMinHashIndex(s, d)
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_ONLY
      (toks.persist(mem), banded.persist(mem))
    })

  /** Stored sign-LSH embedding index frames for `dir`'s steady-state split. */
  def cosine(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    built.computeIfAbsent(key(s, dir, "cosine"), _ => {
      val d = java.nio.file.Files.createTempDirectory("graft-cos-index-").toString
      Vectors.writeCosineIndex(
        load(s, dir, "embeddings").filter(col("vec_id") % VecMod =!= 0), d)
      val (normed, banded) = Vectors.readCosineIndex(s, d)
      val mem = org.apache.spark.storage.StorageLevel.MEMORY_ONLY
      (normed.persist(mem), banded.persist(mem))
    })

  /** Force both index builds and warm the read-back frames — the bench
    * warmup hook that keeps the timed `*_indexed` queries probe-only.
    */
  def prewarm(s: SparkSession, dir: String): Unit = {
    val (t, b) = minHash(s, dir); t.count(); b.count()
    val (n, c) = cosine(s, dir); n.count(); c.count()
    // run (and memoize) the geometry pre-flights too — the timed probes
    // then start straight at candidate generation, like an ingest loop's
    // steady-state iterations after its first batch
    Dedup.minHashPreflight(t, b, 16, 8, 3)
    Vectors.cosinePreflight(n, c, 2, 16, 64)
    ()
  }
}
