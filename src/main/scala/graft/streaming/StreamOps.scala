package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row
import graft.ops.{EventOps, Exact}

/** Structured-Streaming surface (SURVEY §2.8): the same event-time operators
  * as `graft.ops.EventOps`, applied to an unbounded `readStream` input with
  * watermarks. One logical definition, two execution modes — the batch form
  * is what the DuckDB oracle checks; this form is what runs on a live feed.
  *
  * The reference's "streaming" is `schedule.every(N).hours` around a batch
  * re-run (etl/pipeline.py:379-384); these are its honest upgrade:
  * incremental state, event-time semantics, late-data bounds.
  */
object StreamOps {

  /** File-source stream of events rows (schema = the events table). At scale
    * this is the drop-in for a Kafka source — same downstream plan.
    */
  def readEventStream(spark: SparkSession, dir: String,
                      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE, props STRING")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.json(dir)
  }

  /** Tumbling window counts with a watermark: state for a window is dropped
    * once the watermark passes its end — bounded state at any scale. The
    * aggregation itself IS `EventOps.tumblingCounts` — one definition, so
    * the batch form the DuckDB oracle certifies is exactly what streams.
    */
  def tumblingCounts(events: DataFrame, width: String = "10 minutes",
                     watermark: String = "30 minutes"): DataFrame =
    EventOps.tumblingCounts(events.withWatermark("ts", watermark), width)

  /** Session windows per user with watermark-bounded state — delegates to
    * the oracle-checked batch definition (`EventOps.sessionize`).
    */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "30 minutes"): DataFrame =
    EventOps.sessionize(events.withWatermark("ts", watermark), gap)

  /** Streaming dedup: first arrival per (user_id, event_type) wins, with
    * watermark-bounded dedup state — the streaming twin of
    * `EventOps.dedupEarliest`.
    */
  def dedupFirstArrival(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Custom per-key state: running per-user event count + last-seen ts via
    * mapGroupsWithState — the escape hatch for state machines the built-in
    * windows can't express.
    */
  final case class UserState(userId: Long, nEvents: Long, lastTs: Long)
  def runningUserCounts(spark: SparkSession, events: DataFrame): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.selectExpr("user_id", "CAST(ts AS LONG) AS ts_epoch")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserState, UserState](GroupStateTimeout.NoTimeout) {
        case (uid, rows, state) =>
          val prev = state.getOption.getOrElse(UserState(uid, 0L, 0L))
          val batch = rows.toSeq
          val next = UserState(uid, prev.nEvents + batch.size,
            math.max(prev.lastTs, batch.map(_._2).max))
          state.update(next)
          next
      }
      .toDF("user_id", "n_events", "last_ts")
  }

  /** Stream-stream interval join: each `click` joined to the same user's
    * `signup` that happened at most `horizon` earlier. Both sides carry
    * watermarks and the join condition bounds event-time distance, so join
    * state is dropped once the watermark passes — bounded state, the
    * canonical streaming enrichment shape.
    */
  def clicksAfterSignup(events: DataFrame, horizon: String = "1 hour",
                        watermark: String = "30 minutes"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id").as("s_user_id"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", watermark)
    clicks.join(signups,
      col("user_id") === col("s_user_id") &&
        col("click_ts") >= col("signup_ts") &&
        col("click_ts") <= col("signup_ts") + expr(s"INTERVAL $horizon"))
      .select(col("user_id"), col("click_id"),
        unix_timestamp(col("signup_ts")).as("signup_epoch"),
        unix_timestamp(col("click_ts")).as("click_epoch"))
  }

  /** Keyed-upsert sink via foreachBatch: each micro-batch MERGEs into a
    * Parquet table by key (latest event per key wins within the batch via
    * deterministic ordering). The streaming twin of the reference's
    * `INSERT OR REPLACE` run-metadata sink (K3) — exactly-once per key given
    * checkpointed batch ids.
    */
  def upsertSink(df: DataFrame, path: String, checkpoint: String,
                 keys: Seq[String], orderCols: Seq[String]): DataStreamWriter[Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val latest = graft.ops.Relational.firstPerKey(
          batch, keys, orderCols.map(c => col(c).desc))
        val fs = graft.etl.Load.fsFor(spark, path)
        val merged =
          if (fs.exists(new org.apache.hadoop.fs.Path(path)))
            graft.ops.Relational.upsertByKey(
              spark.read.parquet(path), latest, keys)
          else latest
        graft.etl.Load.replaceTable(spark, merged, path)
        ()
      }

  /** Sink helper: append to Parquet with checkpointing (exactly-once file
    * sink semantics).
    */
  def toParquet(df: DataFrame, path: String, checkpoint: String): DataStreamWriter[Row] =
    df.writeStream.format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)

  /** File-source stream of documents rows (schema = the documents table's
    * core columns) — the ingest feed for `incrementalDedupSink`.
    */
  def readDocumentStream(spark: SparkSession, dir: String,
                         maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val reader = spark.readStream
      .schema("doc_id BIGINT, lang STRING, text STRING")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.json(dir)
  }

  /** The steady-state corpus-ingest loop as a STREAMING sink: every
    * micro-batch is (1) exact-deduped against the stored digest set,
    * (2) near-dedup-probed against the stored MinHash index
    * (`Dedup.minHashIncrementalIndexed` — batch shingling + band probes
    * only, the corpus is never re-shingled), (3) its novel survivors land
    * in `stateDir/out/`, and (4) the survivors' digests/shingles/bands are
    * appended to the stored state so the NEXT batch dedups against them.
    *
    * State layout — every table batch-partitioned (`.../batch=<id>/`):
    * {{{
    *   stateDir/digests/batch=<id>/        content_md5 of survivors
    *   stateDir/index/toks/batch=<id>/     shingle sets  (id, ts)
    *   stateDir/index/banded/batch=<id>/   band keys     (id, band, band_key)
    *   stateDir/out/batch=<id>/            surviving document rows
    * }}}
    *
    * EXACTLY-ONCE under restart, by construction rather than by marker
    * files: foreachBatch re-delivers the last uncommitted batch id after a
    * crash, and `dedupDocumentBatch` (a) excludes the CURRENT batch id from
    * every state read — a half-committed previous attempt cannot poison
    * its own recomputation (reading this batch's own appended digests back
    * would kill every row as a "duplicate" and overwrite good output with
    * nothing) — and (b) OVERWRITES exactly its own `batch=<id>` dirs, so a
    * replay converges to the identical state no matter where the previous
    * attempt died. Batch ids are checkpoint-stable, which makes that
    * overwrite well-defined.
    */
  def incrementalDedupSink(docs: DataFrame, stateDir: String, checkpoint: String,
                           threshold: Double = 0.5,
                           numHashes: Int = 16, bands: Int = 8,
                           shingleSize: Int = 3,
                           idCol: String = "doc_id",
                           textCol: String = "text"): DataStreamWriter[Row] =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        dedupDocumentBatch(batch, batchId, stateDir, threshold,
          numHashes, bands, shingleSize, idCol, textCol)
      }

  /** One ingest iteration of `incrementalDedupSink`, public so replay
    * semantics are directly testable: calling it twice with the same
    * `batchId` (the crash-replay case) must leave state and output
    * byte-identical in content to calling it once.
    */
  def dedupDocumentBatch(batch: DataFrame, batchId: Long, stateDir: String,
                         threshold: Double = 0.5,
                         numHashes: Int = 16, bands: Int = 8,
                         shingleSize: Int = 3,
                         idCol: String = "doc_id", textCol: String = "text"): Unit = {
    import graft.ops.Dedup
    import org.apache.spark.sql.SaveMode
    val spark = batch.sparkSession
    val fs = graft.etl.Load.fsFor(spark, stateDir)
    def hasData(p: String) = fs.exists(new org.apache.hadoop.fs.Path(p))
    val digestsRoot = s"$stateDir/digests"
    val toksRoot = s"$stateDir/index/toks"
    val bandedRoot = s"$stateDir/index/banded"
    // State reads EXCLUDE this batch's own partition — see the sink's
    // exactly-once note. `batch` is a partition-discovery column here. A
    // root whose only content is a half-written dir from a crashed attempt
    // (no committed parquet yet) reads as the empty fallback — exactly the
    // state the first attempt started from.
    def readPriorOr(root: String, empty: => DataFrame): DataFrame =
      if (!hasData(root)) empty
      else
        try spark.read.parquet(root).filter(col("batch") =!= batchId).drop("batch")
        catch { case _: org.apache.spark.sql.AnalysisException => empty }
    val mem = org.apache.spark.storage.StorageLevel.MEMORY_ONLY
    val priorDigests =
      readPriorOr(digestsRoot, Dedup.contentDigests(batch.limit(0), textCol))
    val exact = Dedup.exactIncremental(batch, priorDigests, idCol, textCol)
      .persist(mem)
    // schema-correct EMPTY index for the bootstrap batch (storage NONE —
    // nothing to cache); within-batch near-dups are still caught via the
    // probe's NEW×earlier-NEW leg
    lazy val emptyIndex = Dedup.minHashIndex(batch.limit(0), numHashes, bands,
      shingleSize, idCol, textCol, org.apache.spark.storage.StorageLevel.NONE)
    val priorToks = readPriorOr(toksRoot, emptyIndex._1)
    val priorBanded = readPriorOr(bandedRoot, emptyIndex._2)
    val flagged = Dedup.minHashIncrementalIndexed(exact, priorToks, priorBanded,
      threshold, numHashes, bands, shingleSize, idCol, textCol)
    val survivors = exact
      .join(flagged.select(col(idCol)), Seq(idCol), "left_anti")
      .persist(mem)
    def overwriteOwn(df: DataFrame, root: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$root/batch=$batchId")
    overwriteOwn(survivors.drop("content_md5"), s"$stateDir/out")
    overwriteOwn(survivors.select(col("content_md5")), digestsRoot)
    val (sToks, sBanded) = Dedup.minHashIndex(survivors.drop("content_md5"),
      numHashes, bands, shingleSize, idCol, textCol)
    overwriteOwn(sToks, toksRoot)
    overwriteOwn(sBanded, bandedRoot)
    sToks.unpersist()
    sBanded.unpersist()
    survivors.unpersist()
    exact.unpersist()
    ()
  }
}
