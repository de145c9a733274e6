package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** Mergeable-sketch operators beyond the built-in aggregate surface
  * (approx_count_distinct = HLL and percentile_approx = KLL-style already
  * live in the catalog; this adds the third workhorse, count-min).
  *
  * The 100 TB story of a count-min sketch: frequency estimation in ONE
  * pass with FIXED memory (depth x width counters) and map-side partial
  * merge — no shuffle keyed on the (possibly billions of) distinct items,
  * just a tree-reduce of small counter arrays. The price is one-sided
  * error: estimates never undercount, and overcount by at most eps * N
  * with probability >= confidence (Cormode & Muthukrishnan 2005).
  */
object Sketch {

  /** Exact top-k heavy hitters with their count-min estimates and the
    * sketch's error contract as an oracle-checkable verdict.
    *
    * Two plans by design, same shape as the catalog's other verified
    * approximations (agg_approx_distinct / agg_approx_percentile):
    *  - the EXACT side: groupBy(key) count -> top-k by (count desc, key
    *    asc) — the deterministic reference an external engine can replay;
    *  - the SKETCH side: `count_min_sketch` aggregate — one pass, fixed
    *    memory, partial+final merge, NO per-key shuffle — collected as ONE
    *    binary row (bounded: depth*width counters, config-sized) and probed
    *    on the driver for just the k candidate keys.
    *
    * Output per key: (key, exact_n, cms_ok) where cms_ok asserts the CMS
    * guarantee: estimate >= exact AND estimate <= exact + eps * N (N from
    * the sketch's own totalCount). An oracle asserts cms_ok = TRUE, so a
    * drifting sketch fails the round's hash compare.
    */
  def heavyHittersCms(df: DataFrame, key: Column, k: Int,
                      eps: Double = 0.001, confidence: Double = 0.99,
                      seed: Int = 42): DataFrame = {
    require(k >= 1, "k must be >= 1") // fail fast, before the sketch pass
    // distributed one-pass sketch; the collect is ONE bounded binary row
    val bytes = df.agg(
        count_min_sketch(key, lit(eps), lit(confidence), lit(seed)).as("s"))
      .head.getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
    verdictFrame(df, cms, key, k, eps)
  }

  /** The INCREMENTAL sibling: one CMS per ingest batch (batches defined by
    * `batchTag`), merged cell-wise — count-min merging is exact addition
    * of same-geometry counter arrays, so the merged sketch is
    * BIT-IDENTICAL to the one-pass sketch over the union (same seed ⇒
    * same hash rows), and the error contract carries over unchanged. The
    * production shape this pins: each ingest batch ships its fixed-size
    * sketch, the aggregator folds them, raw history is never re-scanned.
    * The collect is bounded by (#batches × sketch size) — both
    * config-sized. The catalog twin shares `agg_heavy_hitters_cms`'s
    * oracle verbatim: the hash match IS the merge ≡ one-pass proof.
    */
  def heavyHittersCmsIncremental(df: DataFrame, batchTag: Column, key: Column,
                                 k: Int, eps: Double = 0.001,
                                 confidence: Double = 0.99,
                                 seed: Int = 42): DataFrame = {
    require(k >= 1, "k must be >= 1") // fail fast, before the sketch pass
    val parts = df.groupBy(batchTag.as("_b"))
      .agg(count_min_sketch(key, lit(eps), lit(confidence), lit(seed)).as("s"))
      .collect().map(_.getAs[Array[Byte]]("s"))
    require(parts.nonEmpty, "no batches to sketch")
    val merged = parts
      .map(b => CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    verdictFrame(df, merged, key, k, eps)
  }

  /** Heavy hitters from a STORED per-batch sketch table (the streaming
    * sink's read side — `StreamOps.cmsSink` writes one serialized sketch
    * row per micro-batch under `stateDir/batch=<id>`): merge every stored
    * sketch cell-wise, then the usual verdict against exact counts over
    * `df`. The collect is bounded by (#batches × sketch size); the fold
    * cadence (`Load.compactPartitioned` or a re-sketch) bounds #batches.
    *
    * The error bound's eps is DERIVED from the merged sketch's own
    * geometry (`relativeError()`), never caller-supplied: the sketches'
    * width was fixed by whatever eps the SINK was configured with, and a
    * reader guessing a different eps would silently compute the wrong
    * slack and a wrong `cms_ok` verdict (seed/width mismatches fail
    * loudly in `mergeInPlace`; eps drift would not).
    */
  def heavyHittersCmsStored(spark: SparkSession, stateDir: String,
                            df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val dir = new org.apache.hadoop.fs.Path(stateDir)
    val fs = graft.etl.Load.fsFor(spark, stateDir)
    require(fs.exists(dir) && fs.listStatus(dir).exists(_.isDirectory),
      s"no stored sketches under $stateDir (has the cmsSink committed a batch yet?)")
    val parts = spark.read.parquet(stateDir).select(col("s"))
      .collect().map(_.getAs[Array[Byte]]("s"))
    require(parts.nonEmpty, s"no stored sketches under $stateDir")
    val merged = parts
      .map(b => CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    verdictFrame(df, merged, key, k, merged.relativeError())
  }

  /** Shared read side: exact top-k next to the sketch estimates with the
    * CMS error contract as an oracle-checkable verdict.
    */
  private def verdictFrame(df: DataFrame, cms: CountMinSketch, key: Column,
                           k: Int, eps: Double): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val spark = df.sparkSession
    val slack = (eps * cms.totalCount).toLong
    // exact candidates: one keyed shuffle + pushed top-k (bounded collect)
    val top = df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("key").asc)
      .limit(k)
      .collect()
    val keyType = top.headOption.map(_ => df.select(key).schema.head.dataType)
      .getOrElse(LongType)
    val rows = top.map { r =>
      val kv = r.get(0)
      val exact = r.getLong(1)
      // integral key types are sketched as longs; strings as strings
      val est = kv match {
        case n: java.lang.Number => cms.estimateCount(n.longValue())
        case other => cms.estimateCount(other)
      }
      Row(kv, exact, est >= exact && est <= exact + slack)
    }
    val schema = StructType(Seq(
      StructField("key", keyType),
      StructField("exact_n", LongType),
      StructField("cms_ok", BooleanType)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](java.util.Arrays.asList(rows: _*)), schema)
  }
}
