package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import java.io.File

/** Pipeline configuration — reference `config/pipeline_config.json`.
  * Compiled defaults here; the companion's `load`/`fromFile` fill the
  * fields from a JSON config file with the reference's path-fallback search
  * (pipeline.py:27-37).
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
    runOnStart: Boolean = true,
    logLevel: String = "INFO",
    logFile: Option[String] = None)

/** Config-file loading — reference parity for `load_config`
  * (etl/pipeline.py:27-37) and the reference's JSON shape
  * (config/pipeline_config.json:1-29). A missing section or key keeps the
  * compiled default, so partial configs are valid.
  */
object PipelineConfig {

  /** Reference search order: container path first, then the local relative
    * path; first existing file wins (pipeline.py:29-33).
    */
  val DefaultPaths: Seq[String] =
    Seq("/app/config/pipeline_config.json", "config/pipeline_config.json")

  /** Load from the first existing path — like the reference, an error if
    * none exists. `loadOrDefaults` is the lenient variant the CLI uses.
    */
  def load(paths: Seq[String] = DefaultPaths,
           appRoot: String = "/app"): PipelineConfig =
    paths.find(new File(_).exists()) match {
      case Some(p) => fromFile(p, appRoot)
      case None => throw new java.io.FileNotFoundException(
        s"pipeline_config.json not found (searched: ${paths.mkString(", ")})")
    }

  def loadOrDefaults(paths: Seq[String] = DefaultPaths): PipelineConfig =
    paths.find(new File(_).exists()).map(fromFile(_)).getOrElse(PipelineConfig())

  /** Parse one config file in the reference's shape. Path-style settings
    * (database, log file) follow the reference's container-vs-local rule:
    * when the container marker directory (`/app`) does not exist the
    * `local_*` variant wins (pipeline.py:46-48). `appRoot` is injectable so
    * tests are independent of the machine they run on.
    */
  def fromFile(path: String, appRoot: String = "/app"): PipelineConfig = {
    val root = new ObjectMapper().readTree(new File(path))
    val d = PipelineConfig()
    def node(sect: String, key: String): Option[JsonNode] =
      Option(root.get(sect)).flatMap(s => Option(s.get(key)))
    def pathFor(sect: String, containerKey: String, localKey: String): Option[String] = {
      val pick =
        if (new File(appRoot).exists()) node(sect, containerKey)
        else node(sect, localKey).orElse(node(sect, containerKey))
      pick.map(_.asText)
    }
    PipelineConfig(
      baseUrl = node("api", "base_url").map(_.asText).getOrElse(d.baseUrl),
      endpoints = node("api", "endpoints").map { arr =>
        val it = arr.elements()
        val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next().asText()
        b.result()
      }.getOrElse(d.endpoints),
      requestDelayMs = node("api", "request_delay_seconds")
        .map(n => (n.asDouble() * 1000).toLong).getOrElse(d.requestDelayMs),
      timeoutSeconds = node("api", "timeout_seconds")
        .map(_.asInt()).getOrElse(d.timeoutSeconds),
      retryAttempts = node("api", "retry_attempts")
        .map(_.asInt()).getOrElse(d.retryAttempts),
      // The engine's store is a parquet warehouse directory, so the
      // reference's SQLite `database.path` maps to the warehouse root.
      warehouse = pathFor("database", "path", "local_path").getOrElse(d.warehouse),
      intervalHours = node("schedule", "interval_hours")
        .map(_.asInt()).getOrElse(d.intervalHours),
      runOnStart = node("schedule", "run_on_start")
        .map(_.asBoolean()).getOrElse(d.runOnStart),
      logLevel = node("logging", "level").map(_.asText).getOrElse(d.logLevel),
      logFile = pathFor("logging", "log_file", "local_log_file").orElse(d.logFile))
  }
}

/** Run-lifecycle logging — reference parity for `setup_logging`
  * (etl/pipeline.py:40-61): every message goes to the slf4j backbone
  * (Spark's console logging) AND, when a file is configured, an append-only
  * log file in the reference's line format
  * `yyyy-MM-dd HH:mm:ss [LEVEL] message` with a single level threshold.
  */
final class RunLogger(logFile: Option[String] = None,
                      level: String = "INFO") extends AutoCloseable {
  private val slf = org.slf4j.LoggerFactory.getLogger("graft.etl.pipeline")
  // WARN and WARNING are synonyms (log4j vs Python spelling); an
  // unrecognized level falls back to INFO — loudly, not to DEBUG silently.
  private val rank = Map("DEBUG" -> 0, "INFO" -> 1, "WARNING" -> 2,
    "WARN" -> 2, "ERROR" -> 3)
  private val threshold = rank.get(level.trim.toUpperCase(java.util.Locale.ROOT)) match {
    case Some(t) => t
    case None =>
      slf.warn(s"unknown log level '$level', defaulting to INFO")
      1
  }
  private val writer = logFile.map { f =>
    val file = new File(f)
    Option(file.getParentFile).foreach(_.mkdirs())
    new java.io.PrintWriter(new java.io.FileWriter(file, true))
  }
  private val fmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
  private def emit(lvl: String, msg: String): Unit = synchronized {
    if (rank(lvl) >= threshold)
      writer.foreach { w =>
        w.println(s"${fmt.format(java.time.Instant.now())} [$lvl] $msg")
        w.flush()
      }
  }
  def debug(msg: String): Unit = { slf.debug(msg); emit("DEBUG", msg) }
  def info(msg: String): Unit = { slf.info(msg); emit("INFO", msg) }
  def warn(msg: String): Unit = { slf.warn(msg); emit("WARNING", msg) }
  def error(msg: String): Unit = { slf.error(msg); emit("ERROR", msg) }
  def close(): Unit = writer.foreach(_.close())
}
