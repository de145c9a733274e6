package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BitmapAggSpec extends SparkSpec {

  import spark.implicits._
  import BitmapAgg.{Bitmap, BitmapOrAgg, BitmapAndAgg}

  private def popcount(bm: Bitmap): Long =
    bm.words.valuesIterator.map(w => java.lang.Long.bitCount(w).toLong).sum

  test("BitmapOrAgg: word boundaries, duplicates, sparse far-apart ids") {
    // ids straddle word 0/1 boundaries, repeat, and jump to a sparse
    // high word (the sf1 id-domain shape)
    val ids = Seq(0L, 1L, 63L, 64L, 64L, 127L, 128L, 1000000000L)
    val bm = ids.toDF("id")
      .agg(BitmapAgg.bitmapOr(col("id")).as("bm"))
      .select(col("bm.words").as("words")).as[Bitmap].head()
    assert(popcount(bm) == 7)  // 64 deduped
    assert(bm.words.keySet == Set(0L, 1L, 2L, 1000000000L >>> 6))
    assert(bm.words(0L) == ((1L << 0) | (1L << 1) | (1L << 63)))
    assert(bm.words(1L) == ((1L << 0) | (1L << 63)))
  }

  test("bitmap distinct is partition-invariant and equals countDistinct") {
    val df = (0L until 500L).map(i => (i % 7, (i * 37) % 101)).toDF("g", "id")
    def run(d: org.apache.spark.sql.DataFrame) = d.groupBy(col("g"))
      .agg(BitmapAgg.bitmapOr(col("id")).as("bm"))
      .select(col("g"),
        aggregate(map_values(col("bm").getField("words")), lit(0L),
          (acc, w) => acc + bit_count(w).cast("long")).as("n"))
      .as[(Long, Long)].collect().toMap
    val expect = df.groupBy(col("g")).agg(countDistinct(col("id")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(run(df) == expect)
    assert(run(df.repartition(13, col("id"))) == expect)
    assert(run(df.repartition(1)) == expect)
  }

  test("BitmapAndAgg: intersection semantics, empty result, empty input") {
    val rows = Seq(
      ("a", 1L), ("a", 2L), ("a", 64L),
      ("b", 2L), ("b", 64L), ("b", 9L),
      ("c", 64L), ("c", 2L), ("c", 500L))
    val perGroup = rows.toDF("g", "id").groupBy(col("g"))
      .agg(BitmapAgg.bitmapOr(col("id")).as("bm"))
    val common = perGroup.agg(BitmapAgg.bitmapAnd(col("bm.words")).as("c"))
      .select(col("c.words").as("words")).as[Bitmap].head()
    // {1,2,64} ∩ {2,64,9} ∩ {64,2,500} = {2,64}
    assert(popcount(common) == 2)
    assert((common.words(0L) & (1L << 2)) != 0L)
    assert((common.words(1L) & 1L) != 0L)
    // disjoint groups intersect to empty
    val disjoint = Seq(("x", 1L), ("y", 100L)).toDF("g", "id")
      .groupBy(col("g")).agg(BitmapAgg.bitmapOr(col("id")).as("bm"))
      .agg(BitmapAgg.bitmapAnd(col("bm.words")).as("c"))
      .select(col("c.words").as("words")).as[Bitmap].head()
    assert(popcount(disjoint) == 0)
    // AND over zero rows = the AndBuf identity, an empty bitmap
    val empty = perGroup.filter(col("g") === "nope")
      .agg(BitmapAgg.bitmapAnd(col("bm.words")).as("c"))
      .select(col("c.words").as("words")).as[Bitmap].head()
    assert(popcount(empty) == 0)
  }

  test("merge algebra directly: OR idempotent/commutative, AND drops zero words") {
    val or = new BitmapOrAgg
    val a = or.reduce(or.reduce(or.zero, 5L), 70L)
    val b = or.reduce(or.zero, 5L)
    assert(or.merge(a, b) == a)            // idempotent
    assert(or.merge(a, b) == or.merge(b, a)) // commutative
    val and = new BitmapAndAgg
    // words that AND to zero must not linger as zero-valued entries
    val l = Bitmap(Map(0L -> 3L, 1L -> 8L))
    val r = Bitmap(Map(0L -> 4L, 1L -> 8L))
    val res = and.finish(and.reduce(and.reduce(and.zero, l), r))
    assert(res.words == Map(1L -> 8L))
    // negative ids rejected (the sparse-word encoding is unsigned)
    intercept[Exception] {
      Seq(-1L).toDF("id").agg(BitmapAgg.bitmapOr(col("id"))).collect()
    }
  }
}
