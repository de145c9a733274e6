package graft.etl

import org.apache.spark.sql.SparkSession
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Pipeline configuration — reference `config/pipeline_config.json`
  * (loaded with path fallback, pipeline.py:27-37; here a plain case class —
  * S6 is a driver-side concern, not a Spark one).
  */
final case class PipelineConfig(
    baseUrl: String = "https://valorant-api.com/v1",
    endpoints: Seq[String] =
      Seq("agents", "weapons", "maps", "gamemodes", "competitivetiers"),
    requestDelayMs: Long = 500,
    timeoutSeconds: Int = 30,
    retryAttempts: Int = 3,
    warehouse: String = "data/warehouse",
    intervalHours: Int = 6,
    runOnStart: Boolean = true)

/** Run lifecycle — reference parity for `ETLPipeline.run`
  * (etl/pipeline.py:314-354): run-id stamp → extract → transform → load →
  * metrics row; failures record a `Failed: <msg>` row and re-raise.
  *
  * In Spark the extract→transform chain per table is ONE lazy plan; the only
  * actions are the per-table writes and counts in the load phase.
  */
final case class RunResult(runId: String, status: String,
                           rowsByTable: Map[String, Long], totalRows: Long)

final class Pipeline(spark: SparkSession, config: PipelineConfig,
                     transport: Extract.Transport,
                     clock: () => Instant = () => Instant.now()) {

  private val iso = DateTimeFormatter.ISO_OFFSET_DATE_TIME.withZone(ZoneOffset.UTC)
  private def nowIso(): String = iso.format(clock())

  /** Run-id format mirrors the reference (strftime('%Y%m%d_%H%M%S'),
    * pipeline.py:326).
    */
  def newRunId(): String =
    DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss").withZone(ZoneOffset.UTC)
      .format(clock())

  def run(): RunResult = {
    val load = new Load(config.warehouse)
    val runId = newRunId()
    val startedAt = nowIso()
    val t0 = System.nanoTime()
    try {
      val raw = Extract.extractAll(spark, transport, config.baseUrl,
        config.endpoints, config.requestDelayMs, config.retryAttempts)
      val transformed = Transforms.transformAll(raw)
      val rows =
        try load.loadAll(transformed, runId, nowIso())
        // transformAll caches fan-out endpoints (agents/weapons feed two
        // tables each); release them so scheduled runs don't accumulate
        // dead cache entries. unpersist on a never-cached frame is a no-op.
        finally raw.values.foreach(_.unpersist())
      val total = rows.values.sum
      val duration = math.rint((System.nanoTime() - t0) / 1e9 * 100) / 100
      load.upsertRow(spark, "etl_runs", Seq("run_id"),
        load.metricsRow(spark, runId, startedAt, nowIso(), "Success",
          rows.count(_._2 > 0), total, duration))
      RunResult(runId, "Success", rows, total)
    } catch {
      case e: Throwable =>
        val duration = math.rint((System.nanoTime() - t0) / 1e9 * 100) / 100
        val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
        load.upsertRow(spark, "etl_runs", Seq("run_id"),
          load.metricsRow(spark, runId, startedAt, nowIso(),
            s"Failed: $msg", 0, 0L, duration))
        throw e
    }
  }

  /** Scheduled mode — the reference's sleep loop (pipeline.py:357-388)
    * expressed as bounded iterations for testability; production would use
    * Structured Streaming `Trigger.ProcessingTime` or an external scheduler
    * (SURVEY §2.8).
    */
  def runScheduled(maxRuns: Int, sleep: Long => Unit = Thread.sleep): Seq[RunResult] =
    (0 until maxRuns).map { i =>
      if (i > 0 || !config.runOnStart) sleep(config.intervalHours * 3600 * 1000L)
      run()
    }
}
