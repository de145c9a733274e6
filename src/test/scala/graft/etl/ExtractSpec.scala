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

  // --- S1/S2 against a REAL socket: a loopback com.sun.net.httpserver ---
  // (the production java.net.http path exercised end to end without
  // network egress — the CI sandbox allows 127.0.0.1)

  private def withServer(handler: com.sun.net.httpserver.HttpHandler)
                        (f: String => Unit): Unit = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", handler)
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}")
    finally srv.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int,
                      body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("S1 live loopback: HttpTransport GETs a real socket, envelope unwraps") {
    val envelope = """{"status":200,"data":[{"uuid":"a","displayName":"X",
      "isPlayableCharacter":true}]}""".replace("\n", "")
    withServer(ex => respond(ex, 200, envelope)) { base =>
      val t = new Extract.HttpTransport(timeoutSeconds = 5)
      val body = t.fetch(s"$base/agents?language=en-US").get
      assert(body == envelope)
      assert(Extract.unwrapEnvelope(spark, "agents", body).count() == 1)
    }
  }

  test("S2 live loopback: 500, 500 then 200 — retry walks the backoff schedule") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer { ex =>
      if (calls.incrementAndGet() <= 2)
        respond(ex, 500, """{"status":500,"data":[]}""")
      else respond(ex, 200, """{"status":200,"data":[]}""")
    } { base =>
      val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
      val r = Extract.fetchWithRetry(new Extract.HttpTransport(5),
        s"$base/agents", attempts = 3, sleep = sleeps += _)
      assert(r.contains("""{"status":200,"data":[]}"""))
      assert(calls.get == 3)
      assert(sleeps.toSeq == Seq(1000L, 2000L)) // 2^0, 2^1 seconds
    }
  }

  test("S2+S5 live loopback: timeout degrades to None and an empty typed frame") {
    withServer { ex =>
      // hold the response past the client timeout; the late write lands on
      // a closed exchange after stop(0) — swallow, it's the point
      Thread.sleep(3000)
      scala.util.Try(respond(ex, 200, """{"status":200,"data":[]}"""))
      ()
    } { base =>
      val t = new Extract.HttpTransport(timeoutSeconds = 1)
      assert(t.fetch(s"$base/maps").isFailure)
      val out = Extract.extractAll(spark, t, base, Seq("maps"), attempts = 1)
      assert(out("maps").count() == 0)
      assert(out("maps").schema == Schemas.GameMap)
    }
  }
}
