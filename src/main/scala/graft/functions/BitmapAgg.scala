package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY §2.9): exact distinct
  * sets as MERGEABLE sparse bitmaps — the Druid/ClickHouse `groupBitmap`
  * pattern. A bitmap OR is commutative, associative and idempotent, so
  * partial aggregation composes freely across partitions and retries
  * (order-independent ⇒ bit-identical to the DuckDB `count(DISTINCT …)`
  * oracle), and the grouped bitmaps themselves compose again: AND-folding
  * the per-group bitmaps answers "members present in EVERY group" without
  * ever re-touching the fact table — the two-level rollup a 100 TB
  * audience-overlap query needs (per-segment sketches maintained
  * incrementally, segment algebra on sketch-sized state).
  *
  * Representation: word-indexed sparse containers — `id` lives in 64-bit
  * word `id >>> 6` at bit `id & 63`, and only non-zero words are stored
  * (`Map[Long, Long]`). The test corpus' user-id domain is SPARSE (sf1:
  * max id 9·10⁷, 15 k distinct), so a dense array would be ~1.4 MB per
  * buffer where this holds ~15 k entries; production engines compress
  * further (roaring run/array containers), which changes constants, not
  * the merge algebra pinned here. Popcounts are left to the DECLARATIVE
  * side: callers fold `bit_count` over `map_values(bm.words)` — codegen'd
  * built-ins, no UDF in the read path.
  */
object BitmapAgg {

  /** Word-indexed sparse bitmap: only non-zero 64-bit words are present. */
  final case class Bitmap(words: Map[Long, Long])

  /** AND-fold buffer: `seen` distinguishes the empty-input identity from
    * an empty INTERSECTION (AND has no sparse identity element — the
    * identity is the full universe, which a sparse map cannot hold).
    */
  final case class AndBuf(seen: Boolean, words: Map[Long, Long])

  private def orWords(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    // fold the smaller side into the larger — merge cost tracks the
    // smaller operand, the usual sketch-union discipline
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foldLeft(big) { case (m, (w, bits)) =>
      m.updated(w, m.getOrElse(w, 0L) | bits)
    }
  }

  private def andWords(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.collect {
      case (w, bits) if (bits & big.getOrElse(w, 0L)) != 0L =>
        w -> (bits & big.getOrElse(w, 0L))
    }
  }

  /** Exact distinct-set union: non-negative ids in, sparse bitmap out. */
  final class BitmapOrAgg extends Aggregator[Long, Bitmap, Bitmap] {
    def zero: Bitmap = Bitmap(Map.empty)
    def reduce(b: Bitmap, id: Long): Bitmap = {
      require(id >= 0, s"bitmap ids must be >= 0, got $id")
      val w = id >>> 6
      Bitmap(b.words.updated(w, b.words.getOrElse(w, 0L) | (1L << (id & 63))))
    }
    def merge(a: Bitmap, b: Bitmap): Bitmap = Bitmap(orWords(a.words, b.words))
    def finish(b: Bitmap): Bitmap = b
    def bufferEncoder: Encoder[Bitmap] = Encoders.product[Bitmap]
    def outputEncoder: Encoder[Bitmap] = Encoders.product[Bitmap]
  }

  /** Bitmap intersection over already-aggregated `Bitmap` structs: the
    * members present in EVERY input bitmap. Empty input ⇒ empty bitmap.
    */
  final class BitmapAndAgg extends Aggregator[Bitmap, AndBuf, Bitmap] {
    def zero: AndBuf = AndBuf(seen = false, Map.empty)
    def reduce(b: AndBuf, bm: Bitmap): AndBuf =
      if (!b.seen) AndBuf(seen = true, bm.words)
      else AndBuf(seen = true, andWords(b.words, bm.words))
    def merge(a: AndBuf, b: AndBuf): AndBuf =
      if (!a.seen) b
      else if (!b.seen) a
      else AndBuf(seen = true, andWords(a.words, b.words))
    def finish(b: AndBuf): Bitmap = Bitmap(b.words)
    def bufferEncoder: Encoder[AndBuf] = Encoders.product[AndBuf]
    def outputEncoder: Encoder[Bitmap] = Encoders.product[Bitmap]
  }

  /** `bitmap_or(idCol)` — untyped-DataFrame registration of the typed
    * Aggregator (`functions.udaf`), the §2.9 UDAF surface.
    */
  def bitmapOr(id: Column): Column = udaf(new BitmapOrAgg, Encoders.scalaLong).apply(id)

  /** `bitmap_and(wordsCol)` over the `MAP<BIGINT,BIGINT>` words field of a
    * level-1 bitmap (a single-field product encoder binds its input
    * parameter FLATTENED — pass `col("bm.words")`, not the struct).
    */
  def bitmapAnd(words: Column): Column = udaf(new BitmapAndAgg, Encoders.product[Bitmap]).apply(words)
}
