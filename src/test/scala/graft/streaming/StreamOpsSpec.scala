package graft.streaming

import graft.SparkSpec
import graft.ops.EventOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming twins of the batch event operators: a file-source
  * stream processed with Trigger.AvailableNow into a memory sink must agree
  * with the batch form on the same data (one definition, two modes).
  */
class StreamOpsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val eventsJsonDir: String = {
    val dir = tmpDir("events-stream")
    val rows = Seq(
      """{"event_id":1,"ts":"2026-01-01T00:01:00Z","user_id":1,"event_type":"click","value":1.5,"props":"{}"}""",
      """{"event_id":2,"ts":"2026-01-01T00:04:00Z","user_id":1,"event_type":"click","value":2.0,"props":"{}"}""",
      """{"event_id":3,"ts":"2026-01-01T00:12:00Z","user_id":1,"event_type":"view","value":0.25,"props":"{}"}""",
      """{"event_id":4,"ts":"2026-01-01T01:00:00Z","user_id":2,"event_type":"click","value":4.0,"props":"{}"}""",
      """{"event_id":5,"ts":"2026-01-01T01:05:00Z","user_id":2,"event_type":"click","value":1.0,"props":"{}"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part1.json"),
      rows.mkString("\n").getBytes("UTF-8"))
    // A later sentinel event in a SECOND file: with maxFilesPerTrigger=1 it
    // forms a second micro-batch whose arrival advances the watermark past
    // every real window, flushing append-mode aggregate state. Its own
    // window stays open (correct) — assertions exclude event_type=sentinel.
    Thread.sleep(5) // distinct mtime so the file source orders part1 first
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part2.json"),
      """{"event_id":99,"ts":"2026-01-01T09:00:00Z","user_id":9,"event_type":"sentinel","value":0.0,"props":"{}"}"""
        .getBytes("UTF-8"))
    dir
  }

  private def readStreamBatched: DataFrame =
    StreamOps.readEventStream(spark, eventsJsonDir, maxFilesPerTrigger = Some(1))

  /** Run a streaming DataFrame to completion (AvailableNow) into a memory
    * sink and return the materialized result.
    */
  private def runToMemory(df: DataFrame, name: String,
                          outputMode: String): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", tmpDir(s"ckpt-$name"))
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")
    spark.table(name)
  }

  private def batchEvents: DataFrame =
    spark.read.schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING").json(eventsJsonDir)

  test("tumblingCounts: streaming result equals the batch twin") {
    val streamed = runToMemory(
      StreamOps.tumblingCounts(readStreamBatched), "tumbling", "append")
      .filter("event_type <> 'sentinel'")
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = EventOps.tumblingCounts(
      batchEvents.filter("event_type <> 'sentinel'"))
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.size == 3) // (00:00 click), (00:10 view), (01:00 click)
  }

  test("sessionize: 30-min-gap sessions close at watermark, match expectations") {
    val out = runToMemory(
      StreamOps.sessionize(readStreamBatched), "sessions", "append")
      .filter("user_id <> 9")
      .orderBy("user_id", "session_start").collect()
    // user 1: events at 00:01/00:04/00:12 → one session; user 2: 01:00/01:05
    assert(out.map(_.getAs[Long]("user_id")).toSeq == Seq(1L, 2L))
    assert(out(0).getAs[Long]("n_events") == 3L)
    assert(out(1).getAs[Long]("n_events") == 2L)
    // FULL-ROW parity with the oracle-checked batch twin (one definition,
    // two modes): every emitted session — bounds, counts, exact sums —
    // matches EventOps.sessionize over the same data.
    val batch = EventOps.sessionize(batchEvents.filter("user_id <> 9"))
      .orderBy("user_id", "session_start").collect().map(_.toSeq).toSeq
    assert(out.map(_.toSeq).toSeq == batch)
  }

  test("dedupFirstArrival: one survivor per (user_id, event_type)") {
    val out = runToMemory(
      StreamOps.dedupFirstArrival(readStreamBatched), "dedup", "append")
      .filter("event_type <> 'sentinel'")
    assert(out.count() == 3) // (1,click),(1,view),(2,click)
  }

  test("late data beyond the watermark is dropped from windowed aggregation") {
    val dir = tmpDir("events-late")
    def write(name: String, rows: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        rows.mkString("\n").getBytes("UTF-8"))
      Thread.sleep(5) // distinct mtimes → deterministic batch order
    }
    write("b1.json", Seq(
      """{"event_id":1,"ts":"2026-01-01T00:01:00Z","user_id":1,"event_type":"click","value":1.0,"props":"{}"}""",
      """{"event_id":2,"ts":"2026-01-01T02:00:00Z","user_id":1,"event_type":"click","value":1.0,"props":"{}"}"""))
    // batch 2 (watermark now 01:30): in-time filler; window 00:00's state
    // is emitted and EVICTED at the end of this batch
    write("b2.json", Seq(
      """{"event_id":3,"ts":"2026-01-01T02:20:00Z","user_id":1,"event_type":"click","value":1.0,"props":"{}"}"""))
    // batch 3: event 28 min behind the watermark, for an already-evicted
    // window → must be dropped (a late row arriving while its window's
    // state is still live would instead be merged — eviction is the cutoff)
    write("b3.json", Seq(
      """{"event_id":4,"ts":"2026-01-01T00:02:00Z","user_id":1,"event_type":"click","value":99.0,"props":"{}"}"""))
    // sentinel advances the watermark past every real window so state flushes
    write("b4.json", Seq(
      """{"event_id":5,"ts":"2026-01-01T09:00:00Z","user_id":9,"event_type":"sentinel","value":0.0,"props":"{}"}"""))
    val out = runToMemory(
      StreamOps.tumblingCounts(
        StreamOps.readEventStream(spark, dir, maxFilesPerTrigger = Some(1))),
      "late", "append")
      .filter("event_type = 'click'")
      .orderBy("window_start").collect()
    val byWindow = out.map(r =>
      r.getAs[Long]("window_start") -> (r.getAs[Long]("n_events"),
        r.getAs[Double]("sum_value"))).toMap
    val w0 = java.time.Instant.parse("2026-01-01T00:00:00Z").getEpochSecond
    // the late event 4 (value 99.0) must NOT appear anywhere
    assert(byWindow(w0) == (1L, 1.0))
    assert(byWindow(w0 + 7200) == (1L, 1.0))
    assert(byWindow(w0 + 8400) == (1L, 1.0))
    assert(!out.exists(_.getAs[Double]("sum_value") == 99.0))
  }

  test("clicksAfterSignup: stream-stream interval join matches the batch join") {
    val dir = tmpDir("events-join")
    val rows = Seq(
      """{"event_id":10,"ts":"2026-01-01T00:00:30Z","user_id":1,"event_type":"signup","value":0,"props":"{}"}""",
      """{"event_id":11,"ts":"2026-01-01T00:05:00Z","user_id":1,"event_type":"click","value":1,"props":"{}"}""",
      """{"event_id":12,"ts":"2026-01-01T02:00:00Z","user_id":1,"event_type":"click","value":1,"props":"{}"}""",
      """{"event_id":13,"ts":"2026-01-01T00:10:00Z","user_id":2,"event_type":"click","value":1,"props":"{}"}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "p1.json"),
      rows.mkString("\n").getBytes("UTF-8"))
    val out = runToMemory(
      StreamOps.clicksAfterSignup(StreamOps.readEventStream(spark, dir)),
      "ssjoin", "append").collect()
    // only click 11 is within 1h of user 1's signup; 12 is too late, user 2
    // never signed up
    assert(out.map(_.getAs[Long]("click_id")).toSeq == Seq(11L))
    val batch = spark.read.schema("event_id BIGINT, ts TIMESTAMP, " +
      "user_id BIGINT, event_type STRING, value DOUBLE, props STRING").json(dir)
    val batchOut = StreamOps.clicksAfterSignup(batch).collect()
    assert(out.map(_.toSeq).toSet == batchOut.map(_.toSeq).toSet)
  }

  test("upsertSink: foreachBatch keyed merge keeps latest event per key across batches") {
    val path = tmpDir("upsert-out") + "/state"
    val q = StreamOps.upsertSink(
      readStreamBatched.selectExpr("user_id", "event_type", "event_id", "ts"),
      path, tmpDir("ckpt-upsert"), Seq("user_id", "event_type"), Seq("ts", "event_id"))
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")
    val rows = spark.read.parquet(path)
      .select("user_id", "event_type", "event_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set((1L, "click", 2L), (1L, "view", 3L),
      (2L, "click", 5L), (9L, "sentinel", 99L)))
  }

  test("toParquet: checkpointed stop/restart is exactly-once — no duplicates, no loss") {
    val src = tmpDir("eo-src")
    val out = tmpDir("eo-out") + "/events"
    val ckpt = tmpDir("eo-ckpt")
    def writeFile(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(src, name),
        rows.mkString("\n").getBytes("UTF-8"))
    def runOnce(): Unit = {
      val q = StreamOps.toParquet(StreamOps.readEventStream(spark, src), out, ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")
    }
    def ids: Seq[Long] = spark.read.parquet(out)
      .select("event_id").as[Long].collect().sorted.toSeq
    writeFile("a.json", Seq(
      """{"event_id":1,"ts":"2026-01-01T00:01:00Z","user_id":1,"event_type":"click","value":1.0,"props":"{}"}""",
      """{"event_id":2,"ts":"2026-01-01T00:02:00Z","user_id":1,"event_type":"view","value":2.0,"props":"{}"}"""))
    runOnce()
    assert(ids == Seq(1L, 2L))
    // restart from the SAME checkpoint after new data lands: only the new
    // file is processed — committed rows are not re-emitted
    writeFile("b.json", Seq(
      """{"event_id":3,"ts":"2026-01-01T00:03:00Z","user_id":2,"event_type":"click","value":3.0,"props":"{}"}"""))
    runOnce()
    assert(ids == Seq(1L, 2L, 3L))
    // idle restart with nothing new: output unchanged
    runOnce()
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("incrementalDedupSink: cross-batch dedup via stored index, restart-safe, replay-idempotent") {
    val src = tmpDir("docs-src")
    val state = tmpDir("dedup-state")
    val ckpt = tmpDir("dedup-ckpt")
    def writeFile(name: String, rows: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(src, name),
        rows.mkString("\n").getBytes("UTF-8"))
      Thread.sleep(5) // distinct mtimes → deterministic batch order
    }
    def runOnce(): Unit = {
      val q = StreamOps.incrementalDedupSink(
        StreamOps.readDocumentStream(spark, src, maxFilesPerTrigger = Some(1)),
        state, ckpt)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")
    }
    def outIds: Set[Long] = spark.read.parquet(s"$state/out")
      .select("doc_id").as[Long].collect().toSet
    writeFile("b1.json", Seq(
      """{"doc_id":1,"lang":"en","text":"the quick brown fox jumps over the lazy dog tonight"}""",
      """{"doc_id":2,"lang":"en","text":"completely different text about spark engines at scale"}""",
      """{"doc_id":3,"lang":"en","text":"the quick brown fox jumps over the lazy dog tonight"}"""))
    writeFile("b2.json", Seq(
      """{"doc_id":11,"lang":"en","text":"the quick brown fox jumps over the lazy dog tonight"}""",
      """{"doc_id":12,"lang":"en","text":"the quick brown fox jumps over the lazy dog today"}""",
      """{"doc_id":13,"lang":"en","text":"novel content never seen in the corpus before now"}"""))
    runOnce()
    // batch 1: doc 3 dies (in-batch exact dup of 1). batch 2 vs STORED
    // state: 11 dies on the digest set, 12 dies on the MinHash index
    // (near-dup of 1 — only the appended index rows can catch it), 13 lives.
    assert(outIds == Set(1L, 2L, 13L))
    // restart from the SAME checkpoint with a third file: the new batch
    // dedups against state appended by BOTH earlier batches
    writeFile("b3.json", Seq(
      """{"doc_id":21,"lang":"en","text":"novel content never seen in the corpus before now"}""",
      """{"doc_id":22,"lang":"en","text":"the quick brown fox jumps over the lazy dog yesterday"}""",
      """{"doc_id":23,"lang":"en","text":"absolutely fresh material arriving in the third batch"}"""))
    runOnce()
    assert(outIds == Set(1L, 2L, 13L, 23L))
    // crash-replay idempotence: re-running the LAST committed batch by hand
    // (what foreachBatch does after a crash before checkpoint commit) must
    // leave output AND stored state identical — not double-append, and not
    // poison itself by reading back its own writes.
    val lastBatch = new java.io.File(s"$state/out").listFiles()
      .map(_.getName).filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).max
    val b3 = spark.read.schema("doc_id BIGINT, lang STRING, text STRING")
      .json(s"$src/b3.json")
    def stateCounts: (Long, Long, Long) = (
      spark.read.parquet(s"$state/digests").count(),
      spark.read.parquet(s"$state/index/toks").count(),
      spark.read.parquet(s"$state/index/banded").count())
    val before = stateCounts
    StreamOps.dedupDocumentBatch(b3, lastBatch, state)
    assert(outIds == Set(1L, 2L, 13L, 23L))
    assert(stateCounts == before)
  }

  test("runningUserCounts: mapGroupsWithState accumulates per-user counts") {
    val out = runToMemory(
      StreamOps.runningUserCounts(spark, readStreamBatched),
      "running", "update")
      .filter("user_id <> 9")
      .orderBy("user_id").collect()
    assert(out.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events")))
      .toSeq == Seq((1L, 3L), (2L, 2L)))
  }
}
