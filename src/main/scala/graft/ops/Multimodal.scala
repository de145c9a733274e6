package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star: "multimodal columns" —
  * /root/repo/BASELINE.json). Media payloads are opaque BINARY columns with
  * typed metadata structs; decode/feature-extraction runs as BATCHED
  * per-partition inference (`mapPartitions` with an explicit micro-batch
  * size — the Scala twin of a Pandas-UDF `mapInPandas` loop).
  *
  * The actual codec is a STUB (this container ships no image/audio libs —
  * builder-prompt note): `StubCodec` produces deterministic fake features.
  * Everything around it — schema, batching shape, partitioning, lineage of
  * bytes → features — is real, tested, and is exactly what a production
  * codec would drop into.
  */
object Multimodal {

  /** A media row: opaque payload + declared metadata (never inferred). */
  final case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features: fixed-dim embedding + basic decode metadata. */
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 width: Int, height: Int, features: Array[Float])

  /** The decode/inference seam. Implementations MUST be batch-oriented:
    * real codecs and models amortize setup per batch, not per record.
    */
  trait Codec extends Serializable {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures]
  }

  /** Deterministic fake decode: "dimensions" from payload length, features
    * from a rolling byte hash. Stands in for image resize / audio frame
    * sample / model forward-pass.
    */
  final class StubCodec(dim: Int = 8) extends Codec {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] =
      batch.map { r =>
        val n = r.payload.length
        val feats = Array.tabulate(dim) { i =>
          var acc = i + 1
          var j = i
          while (j < n) { acc = acc * 31 + (r.payload(j) & 0xff); j += dim }
          (acc & 0xffff).toFloat / 0xffff
        }
        MediaFeatures(r.media_id, r.kind, n, n % 640, n % 480, feats)
      }
  }

  /** SQL-REPLAYABLE stub decode: every output is derived from the md5 of
    * the payload bytes, so a SQL oracle can recompute the whole pipeline
    * (`('0x' || substr(md5(payload), 4i+1, 4))::INT` per feature) and
    * hash-verify the batching path end-to-end — which the rolling-hash
    * `StubCodec` can't offer (not ANSI-SQL-expressible). Feature i is the
    * i-th 16-bit group of the digest as an exact float (≤ 65535, so the
    * float carries it losslessly); dimension is fixed at 8 (32 hex chars /
    * 4). Same width/height rule as StubCodec.
    */
  final class Md5StubCodec extends Codec {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] = {
      // one digest instance per batch — the setup-amortization shape a real
      // codec needs from this seam
      val md = java.security.MessageDigest.getInstance("MD5")
      batch.map { r =>
        val hex = md.digest(r.payload).map("%02x".format(_)).mkString
        val feats = Array.tabulate(8)(i =>
          Integer.parseInt(hex.substring(4 * i, 4 * i + 4), 16).toFloat)
        val n = r.payload.length
        MediaFeatures(r.media_id, r.kind, n, n % 640, n % 480, feats)
      }
    }
  }

  /** Kind-dispatching codec: routes each record to the codec registered for
    * its `kind` (image/audio/video/...), batching PER KIND within each
    * micro-batch so every underlying codec still sees homogeneous batches
    * (real decoders and models are per-modality). Unknown kinds fail fast —
    * silently dropping media is how corpora rot.
    */
  final class CompositeCodec(routes: Map[String, Codec]) extends Codec {
    def decodeBatch(batch: Seq[MediaRecord]): Seq[MediaFeatures] = {
      val unknown = batch.iterator.map(_.kind).filterNot(routes.contains).toSet
      require(unknown.isEmpty,
        s"no codec registered for kind(s): ${unknown.mkString(", ")}")
      // group → decode per kind → restore input order by media_id position
      val byId = batch.groupBy(_.kind).toSeq.flatMap { case (kind, recs) =>
        routes(kind).decodeBatch(recs)
      }.map(f => f.media_id -> f).toMap
      batch.map(r => byId(r.media_id))
    }
  }

  /** Batched feature extraction: one codec instance per PARTITION (setup
    * amortized), records grouped into `batchSize` micro-batches inside each
    * partition. Narrow transformation — no shuffle; scales with partitions.
    */
  def extractFeatures(media: Dataset[MediaRecord], codec: Codec,
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => codec.decodeBatch(b.toSeq))
    }
  }

  /** Lift any table with a binary column into MediaRecords. */
  def asMedia(df: DataFrame, idCol: String, kindCol: String,
              payloadCol: String): Dataset[MediaRecord] = {
    import df.sparkSession.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        col(kindCol).as("kind"), col(payloadCol).cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** End-to-end demo pipeline over the documents table: text bytes stand in
    * for media payloads; returns features keyed by media_id.
    */
  def documentFeatures(spark: SparkSession, docs: DataFrame,
                       batchSize: Int = 64): Dataset[MediaFeatures] =
    extractFeatures(
      asMedia(docs, "doc_id", "lang", "text"), new StubCodec(), batchSize)

  /** 64-bit average-hash (aHash) of a payload, returned as `blocks /
    * bandBits` band words — the perceptual fingerprint of the classic
    * image near-dup pipeline (split the media into 64 blocks, flag each
    * block whose mean sample ≥ the global mean), computed here over raw
    * payload bytes so the stub container stays codec-free; a production
    * deployment computes the same bits over decoded 8×8 luma and
    * NOTHING downstream changes. bit b = 1 iff blockSum·n ≥ totalSum·
    * blockLen — integer cross-multiplication, no division, so an
    * external SQL engine replays every bit; empty blocks (payloads
    * shorter than `blocks` bytes) read 0.
    */
  def aHashBands(payload: Array[Byte], blocks: Int = 64,
                 bandBits: Int = 16): Array[Long] = {
    require(blocks % bandBits == 0, "bandBits must divide blocks")
    val n = payload.length
    val bsum = new Array[Long](blocks)
    val blen = new Array[Long](blocks)
    var tot = 0L
    var i = 0
    while (i < n) {
      val b = ((i.toLong * blocks) / n).toInt
      val v = (payload(i) & 0xff).toLong
      bsum(b) += v; blen(b) += 1; tot += v
      i += 1
    }
    val out = new Array[Long](blocks / bandBits)
    var b = 0
    while (b < blocks) {
      if (blen(b) > 0 && bsum(b) * n >= tot * blen(b))
        out(b / bandBits) |= 1L << (b % bandBits)
      b += 1
    }
    out
  }

  /** Per-record perceptual-hash bands as a DataFrame `(media_id, band,
    * band_val)` — the narrow decode-stage pass (mapPartitions, zero
    * shuffle) that `perceptualNearDupPairs` banded-joins on. Empty
    * payloads are dropped (no perceptual content to hash).
    */
  def perceptualHashBands(media: Dataset[MediaRecord],
                          bandBits: Int = 16): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.filter(_.payload.nonEmpty).flatMap { r =>
        aHashBands(r.payload, bandBits = bandBits).iterator.zipWithIndex
          .map { case (v, k) => (r.media_id, k.toLong, v) }
      }
    }.toDF("media_id", "band", "band_val")
  }

  /** Perceptual near-duplicate pairs: all payload pairs whose 64-bit
    * aHash fingerprints differ in ≤ `maxHamming` bits — the image-dedup
    * primitive (a re-encoded / lightly-edited copy keeps its block-mean
    * structure, so its fingerprint moves a few bits while a different
    * image moves ~32). Same provably-lossless pigeonhole blocking as
    * `Dedup.simHashNearDupPairs`: with 64/bandBits bands > maxHamming,
    * ≤ maxHamming flipped bits cannot touch every band, so every
    * qualifying pair exact-matches on ≥ 1 band word — candidates come
    * from a keyed self-equi-join on (band, band_val), never all pairs,
    * and the hamming verify is codegen'd bit_count(xor) per band.
    * Shuffles are keyed on band values and ids; quadratic work is
    * confined to band-collision buckets.
    */
  def perceptualNearDupPairs(media: Dataset[MediaRecord],
                             maxHamming: Int = 3,
                             bandBits: Int = 16): DataFrame = {
    require(64 % bandBits == 0, "bandBits must divide 64")
    require(64 / bandBits > maxHamming,
      "losslessness needs bands > maxHamming (pigeonhole)")
    val bands = perceptualHashBands(media, bandBits)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("i"), col("b.media_id").as("j"))
      .distinct()
    cand
      .join(bands.select(col("media_id").as("i"), col("band"),
        col("band_val").as("va")), Seq("i"))
      .join(bands.select(col("media_id").as("j"), col("band"),
        col("band_val").as("vb")), Seq("j", "band"))
      .groupBy(col("i").as("media_a"), col("j").as("media_b"))
      .agg(sum(call_function("bit_count",
        col("va").bitwiseXOR(col("vb")))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
