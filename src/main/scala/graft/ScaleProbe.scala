package graft

import org.apache.spark.sql.SparkSession

/** Dev harness for the BAND-RESOLUTION decade probe (BASELINE.md): runs the
  * LSH candidate-budget pre-flights (`Dedup.simHashCandidateBudget`,
  * `Vectors.cosineBandCandidateBudget`) over one or more SF dirs at the
  * catalog's DEFAULT knobs and at knobs SCALED for a larger corpus, and
  * prints one JSON line per probe. The point: fixed knobs make candidate
  * pairs grow ~n²/buckets; knobs scaled with n restore ~linear candidates —
  * this harness turns that analytical claim into a measured table
  * (sf0.1 → sf1 → sf10).
  *
  * Knob variants probed:
  *  - simhash `default` 4 bands × 8-bit slices (the lossless-at-h≤3 shape);
  *    `wide` 2 bands × 16-bit slices (the bucket-space a 64-bit fingerprint
  *    would give each of 4 bands at h≤3 — fingerprint width is the real
  *    production knob; the 2-band probe measures the widened bucket space,
  *    while its own pigeonhole guarantee drops to h≤1).
  *  - minhash `default` 8 bands × 2 hashes; `scaled` 4 bands × 4 hashes
  *    (band collision probability J^r — doubling r squares the
  *    per-band selectivity; recall drops per 1−(1−J^r)^b).
  *  - cosine `default` 16 bands × 2 planes; `scaled3`/`scaled4` 16 bands ×
  *    3/4 planes (each extra plane halves expected bucket occupancy —
  *    recall at a given threshold drops per the (1−θ/π)^r band law, the
  *    documented trade).
  *
  * Usage: runMain graft.ScaleProbe <sfDir> [sfDir...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ScaleProbe <sfDir> [sfDir...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val docs = tables.Tables.load(spark, dir, "documents")
      val emb = tables.Tables.load(spark, dir, "embeddings")
      val probes: Seq[(String, String, () => org.apache.spark.sql.DataFrame)] = Seq(
        ("simhash", "default_4x8", () => ops.Dedup.simHashCandidateBudget(docs)),
        ("simhash", "wide_2x16", () => ops.Dedup.simHashCandidateBudget(docs, bands = 2)),
        ("minhash", "default_8x2", () => ops.Dedup.minHashCandidateBudget(docs)),
        ("minhash", "scaled_4x4",
          () => ops.Dedup.minHashCandidateBudget(docs, bands = 4)),
        ("cosine", "default_16x2", () => ops.Vectors.cosineBandCandidateBudget(emb)),
        ("cosine", "scaled_16x3",
          () => ops.Vectors.cosineBandCandidateBudget(emb, planesPerBand = 3)),
        ("cosine", "scaled_15x4",
          () => ops.Vectors.cosineBandCandidateBudget(emb, planesPerBand = 4, bands = 15)))
      probes.foreach { case (fam, knobs, fn) =>
        val t0 = System.nanoTime()
        val r = fn().collect()(0)
        val dt = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
        val n = r.getLong(0)
        val cand = r.getLong(3)
        val perItem = if (n > 0) math.rint(cand * 1000.0 / n) / 1000 else 0.0
        println(s"""{"probe":"$fam","knobs":"$knobs","dir":"$dir",""" +
          s""""n":$n,"n_buckets":${r.getLong(1)},"max_bucket":${r.getLong(2)},""" +
          s""""cand_pairs":$cand,"cand_per_item":$perItem,"sec":$dt}""")
      }
    }
    spark.stop()
  }
}
