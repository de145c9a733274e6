package graft.catalog

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Vectors}
import graft.tables.Tables.load

/** Session-scoped stored-index cache backing the `dedup_incremental_*_indexed`
  * catalog twins. The non-indexed incremental queries necessarily rebuild the
  * corpus index from text per run (the DuckDB oracle must replay
  * construction), so their bench numbers measure index-build + probe. These
  * twins measure the STEADY STATE a production ingest loop actually runs:
  * the corpus index is built ONCE per session (here, per (session, sf-dir) —
  * `Bench` prewarms it outside the timed region) and persisted to parquet;
  * the timed query then pays only batch shingling + probe joins — the cost
  * profile `Dedup.minHashIncrementalIndexed`/`Vectors.cosineIncrementalIndexed`
  * exist to deliver.
  *
  * The corpus/batch split matches the non-indexed siblings exactly
  * (documents: doc_id % 5, embeddings: vec_id % 7), so the twins reuse their
  * oracle SQL verbatim — identical results, different cost shape.
  */
object StoredIndexes {

  private val built = new ConcurrentHashMap[String, String]()

  private def key(s: SparkSession, dir: String, family: String) =
    s"${System.identityHashCode(s)}|$dir|$family"

  /** Path of the stored MinHash index for `dir`'s corpus split, building it
    * on first use (thread-safe; one build per session × dir).
    */
  def minHash(s: SparkSession, dir: String): String =
    built.computeIfAbsent(key(s, dir, "minhash"), _ => {
      val d = java.nio.file.Files.createTempDirectory("graft-mh-index-").toString
      Dedup.writeMinHashIndex(
        load(s, dir, "documents").filter(col("doc_id") % 5 =!= 0), d)
      d
    })

  /** Path of the stored sign-LSH embedding index for `dir`'s corpus split. */
  def cosine(s: SparkSession, dir: String): String =
    built.computeIfAbsent(key(s, dir, "cosine"), _ => {
      val d = java.nio.file.Files.createTempDirectory("graft-cos-index-").toString
      Vectors.writeCosineIndex(
        load(s, dir, "embeddings").filter(col("vec_id") % 7 =!= 0), d)
      d
    })

  /** Force both index builds — the bench warmup hook that keeps the timed
    * `*_indexed` queries probe-only.
    */
  def prewarm(s: SparkSession, dir: String): Unit = {
    minHash(s, dir); cosine(s, dir); ()
  }
}
