package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared bit machinery for PACKED-signature LSH banding — one place for
  * the two expressions every hamming-family blocking needs (simhash,
  * perceptual hash, sign-LSH): the per-band join keys and the
  * first-matching-band residual that makes a banded self-join emit every
  * candidate pair EXACTLY ONCE, eliminating the distinct-over-fan-out +
  * id-join-back tail that re-shuffles the candidate stream (the sf10
  * scale killer the round-12 simhash rewrite removed).
  *
  * Conventions: the signature is packed low-to-high into ONE long — band
  * (group) `g` covers bits [g·width, (g+1)·width). Works up to
  * bands·width = 64: slices mask after the shift, and the group-collapse
  * below only ever reads each group's own bits into its LOW bit, so
  * arithmetic sign-extension from a set bit 63 never corrupts a probe
  * bit.
  */
private[graft] object BandedBits {

  /** Array of per-band join keys: band index in the high bits, that
    * band's `width`-bit slice in the low bits — a single LONG equi-join
    * key per band instead of a (band, value) pair.
    */
  def bandKeys(packed: Column, width: Int, bands: Int): Column = {
    require(width >= 1 && bands >= 1 && bands * width <= 64,
      s"need 1 <= bands*width <= 64, got $bands x $width")
    array((0 until bands).map { g =>
      lit(g.toLong << width).bitwiseOR(
        shiftright(packed, g * width).bitwiseAND(lit((1L << width) - 1)))
    }: _*)
  }

  /** TRUE only on the FIRST band (lowest group index) where the two
    * packed signatures agree, so an equi-join on `bkey` emits each
    * agreeing pair exactly once and needs NO distinct afterwards. Bit
    * logic: x = sigA^sigB has an all-zero width-bit group exactly at
    * matching bands; the fold collapses each group onto its low bit; the
    * filter demands no matching group strictly below this row's band
    * (bkey >> width).
    */
  def firstMatchingBand(sigA: Column, sigB: Column, bkey: Column,
                        width: Int, bands: Int): Column = {
    val x = sigA.bitwiseXOR(sigB)
    val collapsed = (1 until width).foldLeft(x)(
      (acc, s) => acc.bitwiseOR(shiftright(x, s)))
    val groupBitMask = (0 until bands).map(g => 1L << (g * width)).reduce(_ | _)
    val probe = collapsed.bitwiseXOR(lit(-1L)).bitwiseAND(lit(groupBitMask))
    val earlierMask =
      call_function("shiftleft", lit(1L),
        shiftright(bkey, width) * lit(width)) - 1
    probe.bitwiseAND(earlierMask) === 0
  }

  /** First-matching-band residual for signatures WIDER than one long
    * (MinHash: numHashes × 28-bit values): each side carries its array of
    * per-band join keys (`aKeys`/`bKeys`, one long per band), `band` is
    * this row's band index, and the predicate statically unrolls "no band
    * strictly below this one also agrees" — plain `element_at`
    * comparisons on literal indices, fully codegen, no higher-order
    * functions. Same contract as `firstMatchingBand`: an equi-join on the
    * per-band key emits every agreeing pair exactly once, so NO distinct
    * over the candidate fan-out and no id-keyed join-back to dedup.
    */
  def firstMatchingWideBand(aKeys: Column, bKeys: Column, band: Column,
                            bands: Int): Column =
    if (bands == 1) lit(true)
    else (0 until bands - 1).map { bp =>
      band <= lit(bp.toLong) ||
        element_at(aKeys, bp + 1) =!= element_at(bKeys, bp + 1)
    }.reduce(_ && _)
}
