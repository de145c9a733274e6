package graft.ops

import graft.SparkSpec
import graft.functions.ArrayMath
import org.apache.spark.sql.functions._

/** Exact-integer product quantization (ops/ProductQuantizer) and its native
  * long squared-L2 kernel (functions/ArrayMath.SqDistL2Long).
  */
class ProductQuantizerSpec extends SparkSpec {

  import spark.implicits._

  test("sqDistLongNative: exact long accumulation, null-element skip, " +
      "float arrays rejected at analysis") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 0L, 3L))).toDF("a", "b")
    assert(df.select(ArrayMath.sqDistLongNative(col("a"), col("b")))
      .head.getLong(0) == 9L + 4L + 0L)
    // null element contributes 0, does not null the distance
    val dn = Seq((Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](0L, 5L, 0L)))
      .toDF("a", "b")
    assert(dn.select(ArrayMath.sqDistLongNative(col("a"), col("b")))
      .head.getLong(0) == 1L + 9L)
    // exactness contract: float/double inputs must fail analysis
    val fl = Seq((Seq(1.0f), Seq(2.0f))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      fl.select(ArrayMath.sqDistLongNative(col("a"), col("b"))).head
    }
  }

  // md5("4") < md5("1") < md5("2") < md5("3"), so with k=2 the seeds are
  // id 4 (code 0) and id 1 (code 1).
  private def tinyEmb = Seq(
    (1L, Seq(0f, 0f, 10f, 10f)),
    (2L, Seq(0.000001f, 0.000001f, 10f, 10f)), // near v1
    (3L, Seq(5.000002f, 5f, 0f, 0f)),          // near v4
    (4L, Seq(5f, 5f, 0f, 0f))
  ).toDF("vec_id", "embedding")

  test("train: hand-computed seeds, assignment, floor-division Lloyd round") {
    val cb = ProductQuantizer.train(tinyEmb, m = 2, k = 2, dims = 4)
      .select(col("s"), col("code"),
        transform(col("cvec"), _.cast("long")).as("cvec"))
      .as[(Long, Long, Seq[Long])].collect().toSet
    assert(cb == Set(
      // code 0 ← v3, v4: s0 mean = ((5000002+5000000)//2, 5000000)
      (0L, 0L, Seq(5000001L, 5000000L)),
      (1L, 0L, Seq(0L, 0L)),
      // code 1 ← v1, v2: s0 mean = ((0+1)//2, (0+1)//2) = (0, 0)
      (0L, 1L, Seq(0L, 0L)),
      (1L, 1L, Seq(10000000L, 10000000L))))
  }

  test("encode: codes in subspace order, exact reconstruction error") {
    val e = tinyEmb
    val got = ProductQuantizer.encode(e,
        ProductQuantizer.train(e, m = 2, k = 2, dims = 4), m = 2, dims = 4)
      .select(col("id"), transform(col("codes"), _.cast("long")).as("codes"),
        col("err"))
      .as[(Long, Seq[Long], Long)].collect().toSet
    assert(got == Set(
      (1L, Seq(1L, 1L), 0L),  // exactly the refined centroid
      (2L, Seq(1L, 1L), 2L),  // two scaled units off in s0
      (3L, Seq(0L, 0L), 1L),  // one unit off the floor-divided mean
      (4L, Seq(0L, 0L), 1L)))
  }

  test("train is partitioning-invariant (exact integers, no float means)") {
    val e = graft.tables.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def run(parts: Int) = ProductQuantizer.train(e.repartition(parts))
      .select(col("s"), col("code"),
        array_join(transform(col("cvec"), _.cast("string")), ",").as("c"))
      .as[(Long, Long, String)].collect().toSet
    assert(run(1) == run(13))
    assert(run(1).size == 64) // 4 subspaces x 16 codes, empty cells kept
  }

  test("adcTopK: lookup-table distances, deterministic tie order") {
    val e = tinyEmb
    val cb = ProductQuantizer.train(e, m = 2, k = 2, dims = 4)
    val codes = ProductQuantizer.encode(e, cb, m = 2, dims = 4)
    val q = e.filter(col("vec_id") === 1L)
    val got = ProductQuantizer.adcTopK(codes, cb, q, 3, m = 2, dims = 4)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"), col("rank"))
      .as[(Long, Long, Long, Int)].collect().sortBy(_._4)
    // v2 shares v1's codes → ADC 0; v3/v4 share codes (0,0) → identical
    // ADC distance, tie broken by neighbor id
    assert(got.map(t => (t._2, t._4)).toSeq == Seq((2L, 1), (3L, 2), (4L, 3)))
    assert(got(0)._3 == 0L)
    assert(got(1)._3 == got(2)._3)
    // s0: dist(v1_sub0, c00) = 5000001² + 5000000²; s1: dist to [1e7,1e7]...
    // = 2·1e14 against c10 = [0,0] owner codes — hand total:
    assert(got(1)._3 == 50000010000001L + 200000000000000L)
  }

  test("ivfpqTopK: composed routing + ADC is ranked and partitioning-invariant") {
    val emb = graft.tables.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = emb.filter(col("vec_id") % 100 === 0).orderBy(col("vec_id")).limit(10)
    def run(parts: Int) = ProductQuantizer.ivfpqTopK(emb.repartition(parts), q, 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("adc_dist"))
      .as[(Long, Int, Long, Long)].collect().sortBy(t => (t._1, t._2)).toSeq
    val a = run(1)
    assert(a.nonEmpty && a.map(_._1).distinct.size == 5)
    a.groupBy(_._1).values.foreach { g =>
      val s = g.sortBy(_._2)
      assert(s.map(_._2) == (1 to s.length)) // dense ranks
      assert(s.map(_._4) == s.map(_._4).sorted) // distance-ordered
    }
    assert(a == run(13)) // exact-integer scoring, no float means anywhere
  }

  test("train rejects bad geometry and too-small corpora") {
    intercept[IllegalArgumentException] {
      ProductQuantizer.train(tinyEmb, m = 3, k = 2, dims = 4)
    }
    intercept[IllegalArgumentException] {
      ProductQuantizer.train(tinyEmb, m = 2, k = 5, dims = 4)
    }
  }
}
