package graft.etl

import graft.SparkSpec
import scala.util.{Failure, Success, Try}

/** S1-S5 — ingestion fault tolerance and envelope unwrap
  * (reference semantics: etl/pipeline.py:64-113).
  */
class ExtractSpec extends SparkSpec {

  private class FlakyTransport(failTimes: Int, body: String) extends Extract.Transport {
    var calls = 0
    def fetch(url: String): Try[String] = {
      calls += 1
      if (calls <= failTimes) Failure(new RuntimeException("timeout"))
      else Success(body)
    }
  }

  test("S2: retry succeeds after transient failures with exponential backoff") {
    val t = new FlakyTransport(2, "ok")
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val r = Extract.fetchWithRetry(t, "u", attempts = 3, sleep = sleeps += _)
    assert(r.contains("ok"))
    assert(t.calls == 3)
    assert(sleeps.toSeq == Seq(1000L, 2000L)) // 2^0, 2^1 seconds
  }

  test("S2: degrades to None after final attempt, no sleep after last") {
    val t = new FlakyTransport(Int.MaxValue, "")
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val r = Extract.fetchWithRetry(t, "u", attempts = 3, sleep = sleeps += _)
    assert(r.isEmpty)
    assert(t.calls == 3)
    assert(sleeps.size == 2)
  }

  test("S3: envelope unwrap keeps only status==200 and explodes data") {
    val ok = """{"status":200,"data":[{"uuid":"a","displayName":"X",
      "isPlayableCharacter":true}]}""".replace("\n", "")
    val bad = """{"status":500,"data":[{"uuid":"b"}]}"""
    assert(Extract.unwrapEnvelope(spark, "agents", ok).count() == 1)
    assert(Extract.unwrapEnvelope(spark, "agents", bad).count() == 0)
  }

  test("S5+S4: extractAll fans over endpoints, sleeps between, degrades failures to empty") {
    val agentsBody = """{"status":200,"data":[{"uuid":"a","displayName":"X"}]}"""
    val transport = new Extract.Transport {
      def fetch(url: String): Try[String] =
        if (url.contains("agents")) Success(agentsBody)
        else Failure(new RuntimeException("down"))
    }
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val out = Extract.extractAll(spark, transport, "http://base",
      Seq("agents", "maps"), delayMs = 250, attempts = 2, sleep = sleeps += _)
    assert(out("agents").count() == 1)
    assert(out("maps").count() == 0) // degraded, schema intact
    assert(out("maps").schema == Schemas.GameMap)
    assert(sleeps.contains(250L)) // inter-endpoint delay
  }

  test("S1: FileTransport resolves endpoint fixtures by name") {
    val dir = tmpDir("fixtures")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "agents.json"),
      """{"status":200,"data":[]}""".getBytes("UTF-8"))
    val t = new Extract.FileTransport(dir)
    assert(t.fetch("http://base/agents?language=en-US").get.contains("200"))
    assert(t.fetch("http://base/missing").isFailure)
  }
}
