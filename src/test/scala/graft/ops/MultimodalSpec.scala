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

  test("aHashBands: hand-computed bits, cross-multiplied mean, empty blocks read 0") {
    // payload [0,10,20,30]: n=4 < 64 blocks → bytes land in blocks
    // 0/16/32/48 (i*64/4), all other blocks empty → 0. tot=60, each
    // blen=1: bit = v*4 >= 60 → only v=20 (block 32) and v=30 (block 48).
    assert(Multimodal.aHashBands(Array[Byte](0, 10, 20, 30)).toSeq ==
      Seq(0L, 0L, 1L, 1L))
    // constant payload: every block mean equals the global mean → all 64
    // bits set (>= is inclusive)
    assert(Multimodal.aHashBands(Array.fill[Byte](256)(42)).toSeq ==
      Seq(0xffffL, 0xffffL, 0xffffL, 0xffffL))
  }

  test("perceptualNearDupPairs: identical and lightly-edited payloads pair up; " +
      "band collisions with far hamming are rejected") {
    val base = Array.tabulate(256)(i => (i % 97).toByte)
    val edited = base.clone(); edited(0) = 'X'.toByte
    val media = spark.createDataset(Seq(
      Multimodal.MediaRecord(1L, "image", base),
      Multimodal.MediaRecord(2L, "image", base.clone()),
      Multimodal.MediaRecord(3L, "image", edited),
      // constant vs ramp: both have all-ones upper bands → band-collision
      // candidates, but hamming 32 — must die in the verify
      Multimodal.MediaRecord(4L, "image", Array.fill[Byte](256)(42)),
      Multimodal.MediaRecord(5L, "image", Array.tabulate(256)(i => (i / 4).toByte)),
      Multimodal.MediaRecord(6L, "image", Array.emptyByteArray)))
    val rows = Multimodal.perceptualNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(t => (t._1, t._2)).toSet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(rows.forall(_._3 <= 3))
    assert(rows.find(t => (t._1, t._2) == (1L, 2L)).get._3 == 0L)
    // sanity: the far pair really was a band-collision candidate
    val bands = Multimodal.perceptualHashBands(
      spark.createDataset(Seq(
        Multimodal.MediaRecord(4L, "image", Array.fill[Byte](256)(42)),
        Multimodal.MediaRecord(5L, "image",
          Array.tabulate(256)(i => (i / 4).toByte)))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bands.contains((4L, 3L, 0xffffL)) && bands.contains((5L, 3L, 0xffffL)))
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
