package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k as a typed `Aggregator` — the scale
  * alternative to `row_number() OVER (PARTITION BY g ORDER BY v) <= k`:
  * a window must SORT every group's full row set (per-group sort of the
  * whole fact table, one fat shuffle partition per hot group), while
  * this aggregator keeps at most k entries per group per partition
  * MAP-SIDE and merges k-bounded sorted runs — a grouped top-k becomes a
  * partial aggregation with shuffle O(groups·k), the same state-algebra
  * family as `BitmapAgg` (exact, unbounded) and `KmvAgg` (bounded
  * sketch): bounded exact state.
  *
  * Total order: value DESC, id ASC — ties at the k boundary resolve
  * deterministically, so the result is partitioning-invariant and
  * oracle-replayable (the SQL twin is the window form; the hash match
  * proves the aggregation path selects the identical rows).
  */
object TopKAgg {

  /** One candidate: sort value (e.g. exact cents) + its row id. */
  final case class Entry(v: Long, id: Long)

  /** Buffer/result: entries sorted by (v DESC, id ASC), at most k. */
  final case class TopK(entries: Seq[Entry])

  final class TopKMaxAgg(k: Int) extends Aggregator[Entry, TopK, TopK] {
    require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")
    // (v DESC, id ASC) — `beats` is the strict order on that total order
    private def beats(a: Entry, b: Entry): Boolean =
      a.v > b.v || (a.v == b.v && a.id < b.id)
    def zero: TopK = TopK(Vector.empty)
    def reduce(b: TopK, e: Entry): TopK = {
      val v = b.entries.toVector
      if (v.length >= k && !beats(e, v.last)) b // below the boundary
      else {
        // binary search for e's slot in the (v DESC, id ASC) order —
        // O(log k) compares per accepted row instead of a linear scan
        // (the boundary reject above already filters the common case)
        var lo = 0
        var hi = v.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (beats(e, v(mid))) hi = mid else lo = mid + 1
        }
        val ins = (v.take(lo) :+ e) ++ v.drop(lo)
        TopK(if (ins.length > k) ins.take(k) else ins)
      }
    }
    def merge(a: TopK, b: TopK): TopK = {
      val out = Vector.newBuilder[Entry]
      var (i, j, n) = (0, 0, 0)
      val (x, y) = (a.entries.toVector, b.entries.toVector)
      while (n < k && (i < x.length || j < y.length)) {
        val take =
          if (i >= x.length) { val e = y(j); j += 1; e }
          else if (j >= y.length) { val e = x(i); i += 1; e }
          else if (beats(x(i), y(j))) { val e = x(i); i += 1; e }
          else { val e = y(j); j += 1; e }
        out += take; n += 1
      }
      TopK(out.result())
    }
    def finish(b: TopK): TopK = b
    def bufferEncoder: Encoder[TopK] = Encoders.product[TopK]
    def outputEncoder: Encoder[TopK] = Encoders.product[TopK]
  }

  /** `top_k_max(valueCol, idCol, k)` — untyped-DataFrame registration.
    * Read the result declaratively: `posexplode(col("t.entries"))` gives
    * (rank−1, {v, id}) per kept row.
    */
  def topKMax(v: Column, id: Column, k: Int): Column =
    udaf(new TopKMaxAgg(k), Encoders.product[Entry]).apply(v, id)
}
