package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.{Failure, Success, Try}

/** Ingestion layer — reference parity for `etl/pipeline.py:64-113` (S1-S5).
  *
  * The transport is injectable (S1): production uses `java.net.http` on the
  * DRIVER (ingestion fault tolerance is a pre-DataFrame concern — executor
  * tasks already retry via spark.task.maxFailures), tests use a fixture
  * transport; CI has no network (SURVEY §7.4). Payload parsing is
  * schema-declared `from_json` — never driver-side JSON walking — so the
  * unwrap runs distributed and codegen'd once payloads are large.
  */
object Extract {

  /** S1 transport seam. `fetch` returns the raw response body. */
  trait Transport {
    def fetch(url: String): Try[String]
  }

  /** Production HTTP GET with timeout (reference: requests.get(timeout=30),
    * pipeline.py:80-83).
    */
  final class HttpTransport(timeoutSeconds: Int = 30) extends Transport {
    private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()
    def fetch(url: String): Try[String] = Try {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(timeoutSeconds)).GET().build()
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() != 200) sys.error(s"HTTP ${resp.statusCode()}")
      resp.body()
    }
  }

  /** Test/file transport: resolves URLs against a directory of fixtures. */
  final class FileTransport(dir: String) extends Transport {
    def fetch(url: String): Try[String] = Try {
      val name = url.split("/").last.takeWhile(_ != '?')
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, s"$name.json")), "UTF-8")
    }
  }

  /** S2: N attempts with exponential backoff 2^attempt seconds (reference
    * pipeline.py:80-105); degrades to None after the last attempt — the
    * reference's empty-list degradation, surfaced as an empty DataFrame
    * downstream.
    */
  def fetchWithRetry(transport: Transport, url: String, attempts: Int = 3,
                     sleep: Long => Unit = ms => Thread.sleep(ms)): Option[String] = {
    var i = 0
    while (i < attempts) {
      transport.fetch(url) match {
        case Success(body) => return Some(body)
        case Failure(_) if i < attempts - 1 => sleep((1L << i) * 1000)
        case Failure(_) =>
      }
      i += 1
    }
    None
  }

  /** S3: envelope unwrap as a declarative plan — accept only status == 200,
    * explode the data array (reference pipeline.py:87-93). Element schema is
    * DECLARED per endpoint; unknown endpoints unwrap with just the envelope
    * status (their payload is dropped at transform anyway, P9).
    */
  def unwrapEnvelope(spark: SparkSession, endpoint: String, body: String): DataFrame = {
    import spark.implicits._
    val element = Schemas.byEndpoint.getOrElse(endpoint,
      org.apache.spark.sql.types.StructType(Nil))
    val schema = Schemas.envelope(element)
    Seq(body).toDF("raw")
      .select(from_json(col("raw"), schema).as("env"))
      .filter(col("env.status") === 200)
      .select(explode(col("env.data")).as("rec"))
      .select(col("rec.*"))
  }

  /** S4+S5: fan over configured endpoints with a fixed inter-request delay
    * (reference pipeline.py:107-113 + request_delay_seconds). Failures
    * degrade to empty DataFrames (reference pipeline.py:92-93,103).
    */
  def extractAll(spark: SparkSession, transport: Transport, baseUrl: String,
                 endpoints: Seq[String], delayMs: Long = 0,
                 attempts: Int = 3,
                 sleep: Long => Unit = ms => Thread.sleep(ms)): Map[String, DataFrame] =
    endpoints.zipWithIndex.map { case (endpoint, i) =>
      if (i > 0 && delayMs > 0) sleep(delayMs)
      val body = fetchWithRetry(transport, s"$baseUrl/$endpoint?language=en-US",
        attempts, sleep)
      val df = body match {
        case Some(b) => unwrapEnvelope(spark, endpoint, b)
        case None => spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          Schemas.byEndpoint.getOrElse(endpoint,
            org.apache.spark.sql.types.StructType(Nil)))
      }
      endpoint -> df
    }.toMap
}
