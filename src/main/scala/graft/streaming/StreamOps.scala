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
}
