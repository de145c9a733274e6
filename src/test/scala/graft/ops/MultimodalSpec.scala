package graft.ops

import graft.SparkSpec

/** Multimodal binary-column plumbing: batching shape, determinism, and the
  * DataFrame lift (north-star extension; see ops/Multimodal.scala).
  */
class MultimodalSpec extends SparkSpec {

  import spark.implicits._

  test("extractFeatures: deterministic features regardless of batch size / partitioning") {
    val media = (1L to 50L).map(i =>
      Multimodal.MediaRecord(i, "image", Array.tabulate(i.toInt * 3)(_.toByte)))
    def run(parts: Int, batch: Int) =
      Multimodal.extractFeatures(
        spark.createDataset(media).repartition(parts),
        new Multimodal.StubCodec(), batch)
        .collect().sortBy(_.media_id)
        .map(f => (f.media_id, f.n_bytes, f.features.toSeq)).toSeq
    val a = run(1, 64)
    val b = run(7, 3)
    assert(a == b)
    assert(a.map(_._1) == (1L to 50L))
  }

  test("Md5StubCodec: features are the digest's 16-bit groups, exact in float") {
    // md5("abc") = 900150983cd24fb0d6963f7d28e17f72 → 8 hex quads
    val out = new Multimodal.Md5StubCodec()
      .decodeBatch(Seq(Multimodal.MediaRecord(1L, "image", "abc".getBytes("UTF-8"))))
    assert(out.head.features.toSeq == Seq(0x9001, 0x5098, 0x3cd2, 0x4fb0,
      0xd696, 0x3f7d, 0x28e1, 0x7f72).map(_.toFloat))
    assert(out.head.n_bytes == 3 && out.head.width == 3 && out.head.height == 3)
    // batch-size invariance holds for the md5 stub too (same seam contract)
    val media = (1L to 20L).map(i =>
      Multimodal.MediaRecord(i, "image", Array.tabulate(i.toInt)(_.toByte)))
    def run(parts: Int, batch: Int) =
      Multimodal.extractFeatures(
        spark.createDataset(media).repartition(parts),
        new Multimodal.Md5StubCodec(), batch)
        .collect().sortBy(_.media_id).map(f => (f.media_id, f.features.toSeq)).toSeq
    assert(run(1, 64) == run(5, 3))
  }

  test("codec sees micro-batches bounded by batchSize, one codec per partition") {
    val sizes = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val counting = new Multimodal.Codec {
      private val inner = new Multimodal.StubCodec()
      def decodeBatch(batch: Seq[Multimodal.MediaRecord]) = {
        sizes.add(batch.size)
        inner.decodeBatch(batch)
      }
    }
    val media = (1L to 20L).map(i => Multimodal.MediaRecord(i, "audio", Array(i.toByte)))
    Multimodal.extractFeatures(
      spark.createDataset(media).repartition(2), counting, batchSize = 4).count()
    import scala.jdk.CollectionConverters._
    val observed = sizes.value.asScala.toSeq
    assert(observed.forall(_ <= 4))
    assert(observed.sum == 20)
  }

  test("CompositeCodec routes per kind, preserves order, fails fast on unknown kinds") {
    val tagging = (dim: Int) => new Multimodal.Codec {
      private val inner = new Multimodal.StubCodec(dim)
      def decodeBatch(batch: Seq[Multimodal.MediaRecord]) = {
        assert(batch.map(_.kind).distinct.size == 1) // homogeneous batches
        inner.decodeBatch(batch)
      }
    }
    val codec = new Multimodal.CompositeCodec(
      Map("image" -> tagging(8), "audio" -> tagging(4)))
    val media = (1L to 10L).map(i => Multimodal.MediaRecord(
      i, if (i % 2 == 0) "image" else "audio", Array.tabulate(i.toInt)(_.toByte)))
    val out = codec.decodeBatch(media)
    assert(out.map(_.media_id) == (1L to 10L)) // input order preserved
    assert(out.forall(f =>
      f.features.length == (if (f.kind == "image") 8 else 4)))
    // distributed path: same routing through extractFeatures
    val dist = Multimodal.extractFeatures(
      spark.createDataset(media).repartition(3), codec, batchSize = 4)
      .collect().sortBy(_.media_id)
    assert(dist.map(f => (f.media_id, f.features.toSeq)).toSeq ==
      out.map(f => (f.media_id, f.features.toSeq)).toSeq)
    intercept[IllegalArgumentException] {
      codec.decodeBatch(Seq(Multimodal.MediaRecord(99L, "video", Array(1.toByte))))
    }
  }

  test("asMedia lifts any table's binary column; documentFeatures runs end-to-end") {
    val docs = Seq((10L, "en", "hello world"), (11L, "de", "hallo"))
      .toDF("doc_id", "lang", "text")
    val feats = Multimodal.documentFeatures(spark, docs).collect().sortBy(_.media_id)
    assert(feats.map(_.media_id).toSeq == Seq(10L, 11L))
    assert(feats(0).n_bytes == 11)
    assert(feats(0).features.length == 8)
    assert(feats.forall(_.features.forall(f => f >= 0f && f <= 1f)))
  }
}
