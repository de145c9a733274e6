package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** KMV (k-minimum-values) distinct sketch as a typed `Aggregator` — the
  * BOUNDED-state sibling of `BitmapAgg`: where the bitmap is exact and
  * grows with the distinct set, a KMV sketch holds the k smallest
  * distinct hash values and never exceeds k longs, whatever the
  * cardinality (Bar-Yossef et al. 2002; unbiased estimator and union
  * algebra from Beyer et al. 2007, "On Synopses for Distinct Value
  * Estimation"). The min-k operation is commutative, associative and
  * idempotent, so partial aggregation composes bit-identically across
  * partitions and retries — and because the caller supplies the hash as
  * a DECLARATIVE column (md5-prefix, the engine-portable discipline used
  * across this library), the entire sketch is value-replayable in SQL:
  * the DuckDB oracle ranks the same hashes and reproduces every slot.
  *
  * Read path stays declarative — no UDF touches the sketch after
  * aggregation:
  *  - distinct estimate: `n < k` ⇒ the sketch IS the distinct set (est =
  *    n, exact); else est = (k−1)·M div h₍ₖ₎ with M = 2⁶⁰ the hash
  *    domain (Decimal(38,0) product, integral division — the Beyer
  *    unbiased estimator, floored identically on both engines);
  *  - union: k smallest of `array_union(a, b)` (array built-ins);
  *  - Jaccard / intersection (the theta-sketch trade): over the union
  *    sketch U, J ≈ |{h ∈ U : h ∈ A ∧ h ∈ B}| / |U|, and |A∩B| ≈
  *    common·est_union div |U|.
  *
  * Relative error is ~1/√(k−2) (≈12.6% at k=64); k is a config knob, and
  * the sketch per group is k·8 bytes — the 100 TB shape: per-segment
  * sketches maintained incrementally at ingest, audience algebra on
  * sketch-sized state, the fact table scanned once.
  */
object KmvAgg {

  /** The hash domain: 60-bit md5 prefix, [0, 2⁶⁰). */
  val HashDomain: Long = 1L << 60

  /** KMV sketch: ascending, distinct, at most k hash values. */
  final case class Kmv(hashes: Seq[Long])

  /** Min-k fold over already-hashed values. Inserts cost O(k) per NEW
    * below-threshold hash (k ≤ 1024 by require); values above the current
    * k-th minimum are rejected in O(log k).
    */
  final class KmvMinAgg(k: Int) extends Aggregator[Long, Kmv, Kmv] {
    require(k >= 2 && k <= 1024, s"k must be in [2, 1024], got $k")
    def zero: Kmv = Kmv(Vector.empty)
    def reduce(b: Kmv, h: Long): Kmv = {
      require(h >= 0 && h < HashDomain,
        s"kmv hashes must be in [0, 2^60), got $h")
      val v = b.hashes.toVector
      val i = binarySearch(v, h)
      if (i >= 0) b // already present
      else {
        val at = -i - 1
        if (at >= k) b // above the k-th minimum — sketch unchanged
        else {
          val ins = (v.take(at) :+ h) ++ v.drop(at)
          Kmv(if (ins.length > k) ins.take(k) else ins)
        }
      }
    }
    def merge(a: Kmv, b: Kmv): Kmv = {
      // merge two sorted distinct runs, keep the k smallest
      val out = Vector.newBuilder[Long]
      var (i, j, n) = (0, 0, 0)
      val (x, y) = (a.hashes.toVector, b.hashes.toVector)
      while (n < k && (i < x.length || j < y.length)) {
        val take =
          if (i >= x.length) { val v = y(j); j += 1; v }
          else if (j >= y.length) { val v = x(i); i += 1; v }
          else if (x(i) < y(j)) { val v = x(i); i += 1; v }
          else if (x(i) > y(j)) { val v = y(j); j += 1; v }
          else { val v = x(i); i += 1; j += 1; v }
        out += take; n += 1
      }
      Kmv(out.result())
    }
    def finish(b: Kmv): Kmv = b
    def bufferEncoder: Encoder[Kmv] = Encoders.product[Kmv]
    def outputEncoder: Encoder[Kmv] = Encoders.product[Kmv]
    private def binarySearch(v: Vector[Long], h: Long): Int = {
      var lo = 0; var hi = v.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (v(mid) < h) lo = mid + 1
        else if (v(mid) > h) hi = mid - 1
        else return mid
      }
      -(lo + 1)
    }
  }

  /** `kmv_min(hashCol, k)` — untyped-DataFrame registration. `hashCol`
    * must already be the 60-bit md5-prefix hash (keep hashing in the
    * declarative plan so the oracle can replay it):
    * `conv(substring(md5(cast(x AS STRING)), 1, 15), 16, 10)` cast long.
    */
  def kmvMin(hash: Column, k: Int): Column =
    udaf(new KmvMinAgg(k), Encoders.scalaLong).apply(hash)
}
