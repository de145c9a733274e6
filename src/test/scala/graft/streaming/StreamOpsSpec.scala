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

  test("sequenceMatchStream: custom state equals the batch operator, carried " +
      "across micro-batch boundaries") {
    val dir = tmpDir("seqmatch-events")
    def ev(id: Long, sec: Long, uid: Long, typ: String) =
      s"""{"event_id":$id,"ts":"${java.time.Instant.ofEpochSecond(sec)}",""" +
        s""""user_id":$uid,"event_type":"$typ","value":0.0,"props":"{}"}"""
    // batch 1: u1 open signup (resolves in batch 2); u2 open signup
    // (guarded in batch 2); u3 full in-batch match; u4 open signup
    // (expires in batch 2)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part1.json"), Seq(
      ev(1, 100, 1, "signup"),
      ev(2, 100, 2, "signup"),
      ev(3, 100, 3, "signup"), ev(4, 150, 3, "purchase"),
      ev(5, 100, 4, "signup")
    ).mkString("\n").getBytes("UTF-8"))
    Thread.sleep(5) // distinct mtime → file source orders part1 first
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part2.json"), Seq(
      ev(6, 200, 1, "purchase"),                      // cross-batch match
      ev(7, 150, 2, "error"), ev(8, 200, 2, "purchase"), // guard kills u2
      ev(9, 5000, 4, "purchase"),                     // beyond the bound
      ev(10, 400, 3, "signup"), ev(11, 450, 3, "purchase")
    ).mkString("\n").getBytes("UTF-8"))
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    val streamed = runToMemory(
      StreamOps.sequenceMatchStream(spark,
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir),
        "signup", "purchase", "error", 300L),
      "seqmatch", "append")
      .collect().map(_.toSeq).toSet
    val batch = EventOps.sequenceMatch(
        spark.read.schema(schema).json(dir),
        "signup", "purchase", "error", 300L)
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    // the expected matches themselves, not just agreement: u1 cross-batch,
    // u3 twice in-batch; u2 guarded, u4 expired
    assert(batch.map(r => (r.head, r(1))) ==
      Set((1L, 1L), (3L, 3L), (3L, 10L)))
  }

  test("TopKAgg under streaming aggregation: k-bounded state merges " +
      "across micro-batches to the exact batch top-k") {
    // The typed Aggregator's merge is exercised by Structured Streaming's
    // incremental state (partial per micro-batch, merged into the store) —
    // a streaming leaderboard. maxFilesPerTrigger=1 forces ≥2 state merges.
    val dir = tmpDir("topk-events")
    def ev(id: Long, sec: Long, uid: Long, v: Double) =
      s"""{"event_id":$id,"ts":"${java.time.Instant.ofEpochSecond(sec)}",""" +
        s""""user_id":$uid,"event_type":"purchase","value":$v,"props":"{}"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "p1.json"), Seq(
      ev(1, 10, 1, 5.0), ev(2, 20, 2, 9.0), ev(3, 30, 3, 1.0)
    ).mkString("\n").getBytes("UTF-8"))
    Thread.sleep(5)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "p2.json"), Seq(
      ev(4, 40, 4, 7.0), ev(5, 50, 5, 9.0), ev(6, 60, 6, 2.0)
    ).mkString("\n").getBytes("UTF-8"))
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    import org.apache.spark.sql.functions.{col => c}
    def topk(d: DataFrame) = d
      .selectExpr("event_type", "CAST(round(value * 100) AS BIGINT) AS c",
        "event_id")
      .groupBy(c("event_type"))
      .agg(graft.functions.TopKAgg.topKMax(c("c"), c("event_id"), 3).as("t"))
      .selectExpr("event_type", "CAST(t.entries AS STRING) AS entries")
    val streamed = runToMemory(
      topk(spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .json(dir)),
      "topkstream", "complete")
      .collect().map(_.toSeq).toSet
    val batch = topk(spark.read.schema(schema).json(dir))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    // the winners: 9.00 by id 2 (tie with id 5 at equal cents → smaller
    // id first), then id 5, then 7.00 by id 4 — one from each micro-batch
    assert(batch.head(1) == "[{900, 2}, {900, 5}, {700, 4}]")
  }

  test("attributionLastTouchStream: bounded state equals the batch " +
      "operator, touch carried across micro-batch boundaries") {
    val dir = tmpDir("attrib-events")
    def ev(id: Long, sec: Long, uid: Long, typ: String, v: Double) =
      s"""{"event_id":$id,"ts":"${java.time.Instant.ofEpochSecond(sec)}",""" +
        s""""user_id":$uid,"event_type":"$typ","value":$v,"props":"{}"}"""
    val wk = 604800L
    // batch 1: u1 click+view (view latest — crosses the batch boundary);
    // u2 stale click (out of window by batch 2); u3 nothing yet
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part1.json"), Seq(
      ev(1, 100, 1, "click", 0.0), ev(2, 200, 1, "view", 0.0),
      ev(3, 100, 2, "click", 0.0),
      ev(4, 100, 3, "purchase", 2.5) // no touch → direct, in-batch
    ).mkString("\n").getBytes("UTF-8"))
    Thread.sleep(5)
    // batch 2: u1 converts (cross-batch view credit); u2 converts one
    // second past the window (direct); u1 then clicks and converts again
    // in-batch (click credit — state advanced by the newer touch)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part2.json"), Seq(
      ev(5, 300, 1, "purchase", 10.0),
      ev(6, 101 + wk, 2, "purchase", 5.0),
      ev(7, 400, 1, "click", 0.0), ev(8, 500, 1, "purchase", 1.0)
    ).mkString("\n").getBytes("UTF-8"))
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    val streamed = runToMemory(
      StreamOps.attributionLastTouchStream(spark,
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)),
      "attrib", "append")
      .collect().map(_.toSeq).toSet
    val batch = EventOps.attributionLastTouch(
        spark.read.schema(schema).json(dir))
      .selectExpr("user_id", "event_id", "sec", "value_c", "channel")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.map(r => (r(1), r(4))) == Set(
      (4L, "direct"), (5L, "view"), (6L, "direct"), (8L, "click")))
  }

  test("enrichWithDimension: stream-static broadcast join equals the batch " +
      "join; missing keys pass through with nulls") {
    import org.apache.spark.sql.functions.col
    // user 9 (the sentinel) is NOT in the dimension — must survive with null
    val dim = Seq((1L, "gold"), (2L, "trial"), (7L, "gold"))
      .toDF("user_id", "segment")
    val streamed = runToMemory(
      StreamOps.enrichWithDimension(readStreamBatched, dim)
        .select(col("event_id"), col("user_id"), col("segment")),
      "enriched", "append")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    val batch = StreamOps.enrichWithDimension(batchEvents, dim)
      .select(col("event_id"), col("user_id"), col("segment"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    assert(streamed == batch)
    assert(streamed.size == 6)                       // no fact dropped
    assert(streamed((99L, 9L, None)))                // unmatched → null
    assert(streamed((1L, 1L, Some("gold"))))
  }

  test("twapStream: running LOCF integral, latest emission per user equals " +
      "the batch operator across micro-batch boundaries") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("twap-events")
    def ev(id: Long, sec: Long, uid: Long, v: Double) =
      s"""{"event_id":$id,"ts":"${java.time.Instant.ofEpochSecond(sec)}",""" +
        s""""user_id":$uid,"event_type":"view","value":$v,"props":"{}"}"""
    // batch 1: u1 two observations; u2 one (no span yet)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part1.json"), Seq(
      ev(1, 0, 1, 1.0), ev(2, 100, 1, 3.0),
      ev(3, 0, 2, 9.0)
    ).mkString("\n").getBytes("UTF-8"))
    Thread.sleep(5)
    // batch 2: u1 extends the span (state carries 3.00 from batch 1);
    // u2 gets its first interval
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part2.json"), Seq(
      ev(4, 1000, 1, 5.0),
      ev(5, 10, 2, 1.0)
    ).mkString("\n").getBytes("UTF-8"))
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    val streamed = runToMemory(
      StreamOps.twapStream(spark,
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)),
      "twap", "append")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // latest emission per user = max span (the running den only grows)
    val latest = streamed.groupBy(_._1).map { case (u, rows) =>
      val r = rows.maxBy(_._3); u -> ((r._2, r._3)) }
    val batch = EventOps.twapCents(
        spark.read.schema(schema).json(dir))
      .select(col("user_id"), col("twap_cents"), col("span_sec"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(latest == batch)
    // the cross-batch fold itself: u1 = (100*100 + 300*900) div 1000 = 280
    assert(latest(1L) == ((280L, 1000L)))
    // u2's first batch emitted nothing (zero span); batch 2 gives 900*10/10
    assert(latest(2L) == ((900L, 10L)))
    assert(!streamed.exists(r => r._1 == 2L && r._3 == 0L))
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

  test("bloomDedupSink: streamed survivors ≡ the serial exactIncremental " +
      "closure, sketch state OR-folds across batches, replay-idempotent") {
    val src = tmpDir("bloom-src")
    val state = tmpDir("bloom-state")
    val ckpt = tmpDir("bloom-ckpt")
    def writeFile(name: String, rows: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(src, name),
        rows.mkString("\n").getBytes("UTF-8"))
      Thread.sleep(5) // distinct mtimes → deterministic batch order
    }
    def runOnce(): Unit = {
      val q = StreamOps.bloomDedupSink(
        StreamOps.readDocumentStream(spark, src, maxFilesPerTrigger = Some(1)),
        state, ckpt, expectedItems = 1L << 10, numBits = 1L << 14)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")
    }
    def outIds: Set[Long] = spark.read.parquet(s"$state/out")
      .select("doc_id").as[Long].collect().toSet
    writeFile("b1.json", Seq(
      """{"doc_id":1,"lang":"en","text":"alpha beta gamma"}""",
      """{"doc_id":2,"lang":"en","text":"delta epsilon zeta"}""",
      """{"doc_id":3,"lang":"en","text":"alpha beta gamma"}"""))
    writeFile("b2.json", Seq(
      """{"doc_id":11,"lang":"en","text":"alpha beta gamma"}""",
      """{"doc_id":12,"lang":"en","text":"eta theta iota"}"""))
    runOnce()
    // batch 1: 3 dies in-batch. batch 2: 11 dies via the PRIOR batch's
    // sketch + digest confirm (only stored state can catch it), 12 lives.
    assert(outIds == Set(1L, 2L, 12L))
    // a micro-batch with ZERO survivors (every row already in state) must
    // write a VALID empty sketch — BloomFilterAggregate over zero rows
    // yields NULL, and a null row in sketch state would crash every later
    // OR-fold (the re-crawled-file case)
    writeFile("b2x.json", Seq(
      """{"doc_id":15,"lang":"en","text":"alpha beta gamma"}""",
      """{"doc_id":16,"lang":"en","text":"eta theta iota"}"""))
    runOnce()
    assert(outIds == Set(1L, 2L, 12L))
    // third batch from the SAME checkpoint: prior state is the OR-fold of
    // THREE sketches (one empty) — a dup of batch-1 content AND a dup of
    // batch-2 content must both die; one fresh doc lives
    writeFile("b3.json", Seq(
      """{"doc_id":21,"lang":"en","text":"delta epsilon zeta"}""",
      """{"doc_id":22,"lang":"en","text":"eta theta iota"}""",
      """{"doc_id":23,"lang":"en","text":"kappa lambda mu"}"""))
    runOnce()
    assert(outIds == Set(1L, 2L, 12L, 23L))
    // one sketch partition per micro-batch in the state dir
    val sketchBatches = new java.io.File(s"$state/bloom").listFiles()
      .map(_.getName).filter(_.startsWith("batch=")).toSet
    assert(sketchBatches.size == 4, s"sketch partitions: $sketchBatches")
    // ≡ the BATCH closure: fold exactIncremental serially over the same
    // four micro-batches (the plain, sketch-free semantics)
    val batches = Seq("b1.json", "b2.json", "b2x.json", "b3.json").map(f =>
      spark.read.schema("doc_id BIGINT, lang STRING, text STRING")
        .json(s"$src/$f"))
    val empty = graft.ops.Dedup.contentDigests(batches.head.limit(0))
    val (closureIds, _) = batches.foldLeft((Set.empty[Long], empty)) {
      case ((ids, digests), bdf) =>
        val surv = graft.ops.Dedup.exactIncremental(bdf, digests)
        (ids ++ surv.select("doc_id").as[Long].collect(),
          digests.unionByName(surv.select("content_md5")))
    }
    assert(outIds == closureIds,
      s"streamed $outIds != batch closure $closureIds")
    // crash-replay idempotence: re-running the LAST committed batch by
    // hand must leave output, digests AND sketch state identical in
    // content — not double-append, not poisoned by its own writes
    val lastBatch = sketchBatches.map(_.stripPrefix("batch=").toLong).max
    val b3 = spark.read.schema("doc_id BIGINT, lang STRING, text STRING")
      .json(s"$src/b3.json")
    def stateCounts: (Long, Long) = (
      spark.read.parquet(s"$state/digests").count(),
      spark.read.parquet(s"$state/bloom").count())
    val before = stateCounts
    StreamOps.bloomDedupBatch(b3, lastBatch, state,
      expectedItems = 1L << 10, numBits = 1L << 14)
    assert(outIds == Set(1L, 2L, 12L, 23L))
    assert(stateCounts == before)
  }

  test("incrementalDedupSinkBucketed: bucketed base + delta fold, same semantics, replay-idempotent") {
    val state = tmpDir("dedup-bstate")
    val name = "sdx_stream"
    def batchDf(rows: Seq[(Long, String)]): DataFrame =
      rows.map { case (id, t) => (id, "en", t) }.toDF("doc_id", "lang", "text")
        .repartition(3) // multi-file deltas/digests → compaction observable
    val wh = new graft.etl.Load(tmpDir("sdx-wh"))
    def run(b: DataFrame, id: Long): Unit =
      StreamOps.dedupDocumentBatchBucketed(b, id, state, wh, name, 4, foldEvery = 2)
    def outIds: Set[Long] = spark.read.parquet(s"$state/out")
      .select("doc_id").as[Long].collect().toSet
    try {
      run(batchDf(Seq(
        1L -> "the quick brown fox jumps over the lazy dog tonight",
        2L -> "completely different text about spark engines at scale",
        3L -> "the quick brown fox jumps over the lazy dog tonight")), 0L)
      run(batchDf(Seq(
        11L -> "the quick brown fox jumps over the lazy dog tonight",
        12L -> "the quick brown fox jumps over the lazy dog today",
        13L -> "novel content never seen in the corpus before now")), 1L)
      // same cross-batch semantics as the plain sink: 3 in-batch exact dup,
      // 11 exact vs stored digests, 12 near-dup vs the stored index
      assert(outIds == Set(1L, 2L, 13L))
      run(batchDf(Seq(
        21L -> "novel content never seen in the corpus before now",
        22L -> "absolutely fresh material arriving in the third batch")), 2L)
      assert(outIds == Set(1L, 2L, 13L, 22L))
      // batch 2's maintenance folded deltas 0+1 into the bucketed base;
      // only its own (excluded) delta remains unfolded
      def deltaIds(root: String): Set[String] =
        new java.io.File(root).listFiles().toSeq
          .map(_.getName).filter(_.startsWith("batch=")).toSet
      assert(deltaIds(s"$state/index/toks") == Set("batch=2"))
      assert(deltaIds(s"$state/index/banded") == Set("batch=2"))
      assert(spark.catalog.tableExists(s"${name}_toks"))
      // folded rows = batches 0+1 survivors (ids 1, 2, 13)
      assert(spark.table(s"${name}_toks").select("id").as[Long].collect().toSet
        == Set(1L, 2L, 13L))
      // the bucketed base really is pre-shuffled on the probe join's keys
      val agged = spark.table(s"${name}_banded").groupBy("band", "band_key").count()
      agged.collect()
      def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = p match {
        case _: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => 1
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => 1
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          shuffles(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => shuffles(q.plan)
        case other => other.children.map(shuffles).sum
      }
      assert(shuffles(agged.queryExecution.executedPlan) == 0,
        "bucketed index base must be pre-shuffled on (band, band_key)")
      // digest state was compacted on the fold cadence: one file per leaf
      // (each batch wrote 3 — repartition(3) above)
      val digestLeaves = new java.io.File(s"$state/digests").listFiles()
        .filter(_.getName.startsWith("batch="))
      assert(digestLeaves.nonEmpty && digestLeaves.forall(
        _.listFiles().count(_.getName.endsWith(".parquet")) == 1),
        "digest leaves not compacted to one file")
      // crash-replay idempotence AFTER a fold: re-running the last batch must
      // leave output and state (base + deltas) identical
      def stateRows: (Long, Long, Long) = (
        spark.read.parquet(s"$state/digests").count(),
        spark.table(s"${name}_toks").count() +
          spark.read.parquet(s"$state/index/toks").drop("batch").count(),
        spark.table(s"${name}_banded").count() +
          spark.read.parquet(s"$state/index/banded").drop("batch").count())
      val before = stateRows
      run(batchDf(Seq(
        21L -> "novel content never seen in the corpus before now",
        22L -> "absolutely fresh material arriving in the third batch")), 2L)
      assert(outIds == Set(1L, 2L, 13L, 22L))
      assert(stateRows == before)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS ${name}_toks")
      spark.sql(s"DROP TABLE IF EXISTS ${name}_banded")
    }
  }

  test("maintainDedupState: compaction shrinks fragmented state leaves, content identical") {
    val state = tmpDir("dedup-maint")
    // three micro-batches' worth of fragmented digest state (3 files each)
    (0 to 2).foreach { b =>
      (1 to 3).map(i => s"md5-$b-$i").toDF("content_md5").repartition(3)
        .write.parquet(s"$state/digests/batch=$b")
    }
    val before = spark.read.parquet(s"$state/digests")
      .select("content_md5").as[String].collect().toSet
    def nFiles: Int = new java.io.File(s"$state/digests").listFiles()
      .filter(_.getName.startsWith("batch="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(nFiles == 9)
    StreamOps.maintainDedupState(spark, state)
    assert(nFiles == 3, s"expected 3 files after compaction, got $nFiles")
    assert(spark.read.parquet(s"$state/digests")
      .select("content_md5").as[String].collect().toSet == before)
  }

  test("upsertSinkPartitioned: a micro-batch rewrites ONLY the key partitions it touches") {
    val path = tmpDir("upsert-part") + "/state"
    val ckpt = tmpDir("ckpt-upsert-part")
    val nParts = 8
    // batch 1: keys spread over many partitions
    val b1 = (1L to 40L).map(k => (k, "click", k * 10, k)).toDF("user_id", "event_type", "event_id", "ts")
    StreamOps.upsertBatchPartitioned(b1, path, Seq("user_id", "event_type"),
      Seq("ts", "event_id"), nParts)
    val dirs = new java.io.File(path).listFiles().filter(_.getName.startsWith("_kp="))
    assert(dirs.length > 1, "keys should spread over multiple partitions")
    def filesOf(d: java.io.File): Set[String] =
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val filesBefore = dirs.map(d => d.getName -> filesOf(d)).toMap
    // batch 2: ONE key updated — only its partition may be rewritten
    val b2 = Seq((7L, "click", 9999L, 99L)).toDF("user_id", "event_type", "event_id", "ts")
    StreamOps.upsertBatchPartitioned(b2, path, Seq("user_id", "event_type"),
      Seq("ts", "event_id"), nParts)
    val touched = b2.selectExpr(s"pmod(hash(user_id, event_type), $nParts)")
      .as[Int].head()
    val dirsAfter = new java.io.File(path).listFiles().filter(_.getName.startsWith("_kp="))
    dirsAfter.foreach { d =>
      if (d.getName == s"_kp=$touched")
        assert(filesOf(d) != filesBefore(d.getName), "touched partition must be rewritten")
      else
        assert(filesOf(d) == filesBefore(d.getName),
          s"untouched partition ${d.getName} was rewritten")
    }
    // merge semantics: key 7 now carries the batch-2 row, everything else intact
    val rows = spark.read.parquet(path)
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(rows(7L) == 9999L)
    assert(rows(8L) == 80L && rows.size == 40)
    // replay of the same batch converges to the identical table
    StreamOps.upsertBatchPartitioned(b2, path, Seq("user_id", "event_type"),
      Seq("ts", "event_id"), nParts)
    val rows2 = spark.read.parquet(path)
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(rows2 == rows)
    // and the streaming wrapper drives the same per-batch merge
    val src = tmpDir("upsert-part-src")
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "a.json"),
      """{"event_id":1,"ts":"2026-01-01T00:01:00Z","user_id":1,"event_type":"click","value":1.0,"props":"{}"}"""
        .getBytes("UTF-8"))
    val q = StreamOps.upsertSinkPartitioned(
      StreamOps.readEventStream(spark, src)
        .selectExpr("user_id", "event_type", "event_id", "CAST(ts AS LONG) AS ts"),
      tmpDir("upsert-part2") + "/t", ckpt, Seq("user_id", "event_type"),
      Seq("ts", "event_id"), nParts)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")
  }

  test("incrementalAggSink: partials per micro-batch, fold cadence, replay-idempotent") {
    import org.apache.spark.sql.functions._
    val src = tmpDir("agg-src")
    val state = tmpDir("agg-state")
    val ckpt = tmpDir("agg-ckpt")
    def writeFile(name: String, rows: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(src, name),
        rows.mkString("\n").getBytes("UTF-8"))
      Thread.sleep(5)
    }
    def doc(id: Long, lang: String, text: String) =
      s"""{"doc_id":$id,"lang":"$lang","text":"$text"}"""
    writeFile("b1.json", Seq(doc(1, "en", "aa bb"), doc(2, "de", "cc")))
    writeFile("b2.json", Seq(doc(3, "en", "dd ee ff"), doc(2, "de", "cc")))
    writeFile("b3.json", Seq(doc(4, "fr", "gg"), doc(5, "en", "hh")))
    def runOnce(): Unit = {
      val q = StreamOps.incrementalAggSink(
        StreamOps.readDocumentStream(spark, src, maxFilesPerTrigger = Some(1)),
        state, ckpt, Seq("lang"), length(col("text")).cast("long"),
        col("doc_id"), foldEvery = 2)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")
    }
    runOnce()
    def merged: Map[String, (Long, Long, Long, Long, Long)] =
      graft.ops.IncrAgg.mergeState(graft.ops.IncrAgg.readState(spark, state), Seq("lang"))
        .as[(String, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // en: docs 1(5),3(8),5(2); de: doc 2 twice(2,2); fr: doc 4(2)
    val expect = Map(
      "en" -> ((3L, 15L, 2L, 8L, 3L)),
      "de" -> ((2L, 4L, 2L, 2L, 1L)),
      "fr" -> ((1L, 2L, 2L, 2L, 1L)))
    assert(merged == expect)
    // fold cadence (foldEvery=2) collapsed prior batches: fewer batch dirs
    // than micro-batches, and the in-flight batch dir survived the fold
    val dirs = new java.io.File(state).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("batch=")).sorted
    assert(dirs.length < 3 && dirs.contains("batch=0"))
    // crash-replay: re-run the LAST batch id by hand — totals unchanged
    // (own-dir overwrite + the fold never absorbed the in-flight batch)
    val lastId = dirs.map(_.stripPrefix("batch=").toLong).max
    val b3 = spark.read.schema("doc_id BIGINT, lang STRING, text STRING")
      .json(s"$src/b3.json")
    StreamOps.aggStateBatch(b3, lastId, state, Seq("lang"),
      length(col("text")).cast("long"), col("doc_id"), foldEvery = 2)
    assert(merged == expect)
    // restart with a fourth file: checkpoint resumes, totals extend
    writeFile("b4.json", Seq(doc(6, "en", "ii jj kk")))
    runOnce()
    assert(merged("en") == ((4L, 23L, 2L, 8L, 4L)))
  }

  test("incrementalAggSink keyed by hour yields rolling-window uniques without rescanning") {
    import org.apache.spark.sql.functions._
    val src = tmpDir("roll-src")
    val state = tmpDir("roll-state")
    val ckpt = tmpDir("roll-ckpt")
    def ev(id: Long, t: String, u: Long) =
      s"""{"event_id":$id,"ts":"$t","user_id":$u,"event_type":"click","value":0.0,"props":"{}"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "a.json"), Seq(
      ev(1, "2026-01-01T00:10:00Z", 1), ev(2, "2026-01-01T00:20:00Z", 2),
      ev(3, "2026-01-01T01:10:00Z", 1), ev(4, "2026-01-01T02:10:00Z", 3)
    ).mkString("\n").getBytes("UTF-8"))
    Thread.sleep(5)
    java.nio.file.Files.write(java.nio.file.Paths.get(src, "b.json"), Seq(
      ev(5, "2026-01-01T02:20:00Z", 4), ev(6, "2026-01-01T01:40:00Z", 2)
    ).mkString("\n").getBytes("UTF-8"))
    val q = StreamOps.incrementalAggSink(
      StreamOps.readEventStream(spark, src, maxFilesPerTrigger = Some(1))
        .select(unix_timestamp(date_trunc("hour", col("ts"))).as("h"),
          col("user_id")),
      state, ckpt, Seq("h"), lit(1L), col("user_id"), foldEvery = 8)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")
    // trailing 2-hour uniques straight off the STORED hourly sketches —
    // the state table, not the raw events, is all the window needs
    val rolled = graft.ops.IncrAgg.readState(spark, state)
      .select(explode(array(col("h"), col("h") + 3600L)).as("w"), col("p_hll"))
      .groupBy("w")
      .agg(hll_sketch_estimate(hll_union_agg(col("p_hll"))).as("u"))
      .as[(Long, Long)].collect().toMap
    val h0 = java.time.Instant.parse("2026-01-01T00:00:00Z").getEpochSecond
    // exact at these cardinalities: h0:{1,2}, h1:{1,2}, h2:{3,4} →
    // windows ending h0:{1,2}=2, h1:{1,2}=2, h2:{1,2,3,4}=4, h3:{3,4}=2
    assert(rolled == Map(h0 -> 2L, (h0 + 3600) -> 2L, (h0 + 7200) -> 4L,
      (h0 + 10800) -> 2L))
  }

  test("embeddingDedupSink: cross-batch semantic dups dropped; replay idempotent") {
    import org.apache.spark.sql.functions._
    val src = tmpDir("emb-src")
    val state = tmpDir("emb-state")
    val ckpt = tmpDir("emb-ckpt")
    def vec(id: Long, v: Seq[Double]) =
      s"""{"vec_id":$id,"embedding":[${v.mkString(",")}]}"""
    def writeFile(name: String, rows: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(src, name),
        rows.mkString("\n").getBytes("UTF-8"))
      Thread.sleep(5)
    }
    // batch 0: two orthogonal vectors; batch 1: a near-copy of v1 (dup),
    // a novel direction, and a within-batch near-copy of that novel one
    writeFile("b1.json", Seq(
      vec(1, Seq(1, 0, 0, 0)), vec(2, Seq(0, 1, 0, 0))))
    writeFile("b2.json", Seq(
      vec(3, Seq(0.99, 0.01, 0, 0)), vec(4, Seq(0, 0, 1, 0)),
      vec(5, Seq(0, 0.01, 0.99, 0))))
    val q = StreamOps.embeddingDedupSink(
      StreamOps.readEmbeddingStream(spark, src, maxFilesPerTrigger = Some(1)),
      state, ckpt, threshold = 0.9, dims = 4)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    def survivors: Set[Long] = spark.read.parquet(s"$state/out")
      .select(col("vec_id")).as[Long].collect().toSet
    assert(survivors == Set(1L, 2L, 4L)) // 3 dups 1; 5 dups 4 within batch
    // crash-replay of the LAST batch: state reads exclude its own dirs
    val b2 = spark.read.schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .json(s"$src/b2.json")
    StreamOps.embeddingDedupBatch(b2, 1L, state, threshold = 0.9, dims = 4)
    assert(survivors == Set(1L, 2L, 4L))
    // the index state matches the survivors exactly
    assert(spark.read.parquet(s"$state/normed").select(col("id"))
      .as[Long].collect().toSet == Set(1L, 2L, 4L))
  }

  test("oovSink: batches score against prior vocab only; replay idempotent") {
    import org.apache.spark.sql.functions._
    val src = tmpDir("oov-src")
    val state = tmpDir("oov-state")
    val ckpt = tmpDir("oov-ckpt")
    def doc(id: Long, text: String) =
      s"""{"doc_id":$id,"lang":"en","text":"$text"}"""
    def writeFile(name: String, rows: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(src, name),
        rows.mkString("\n").getBytes("UTF-8"))
      Thread.sleep(5)
    }
    writeFile("b1.json", Seq(doc(1, "alpha beta")))
    writeFile("b2.json", Seq(doc(2, "alpha gamma")))
    val q = StreamOps.oovSink(
      StreamOps.readDocumentStream(spark, src, maxFilesPerTrigger = Some(1)),
      state, ckpt).trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    def reports: Map[Long, (Long, Long, Long)] =
      spark.read.parquet(s"$state/report")
        .select(col("batch").cast("long"), col("n_tokens"), col("n_oov"),
          col("oov_bp"))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // batch 0: empty vocab → all OOV; batch 1: alpha known, gamma OOV
    assert(reports == Map(0L -> ((2L, 2L, 10000L)), 1L -> ((2L, 1L, 5000L))))

    // crash-replay of the LAST batch: the state read excludes its own
    // batch dir, so the recomputed report and the vocab state are identical
    val b2 = spark.read.schema("doc_id BIGINT, lang STRING, text STRING")
      .json(s"$src/b2.json")
    StreamOps.oovDocumentBatch(b2, 1L, state)
    assert(reports == Map(0L -> ((2L, 2L, 10000L)), 1L -> ((2L, 1L, 5000L))))
    assert(spark.read.parquet(s"$state/vocab").drop("batch")
      .as[(String, String, Long)].collect().toSet ==
      Set(("en", "alpha", 1L), ("en", "beta", 1L), ("en", "gamma", 1L)))
  }

  test("perplexitySink: batches score against the prior-batch LM only; " +
      "stream report equals the batch scorer; replay idempotent") {
    import org.apache.spark.sql.functions._
    val src = tmpDir("ppl-src")
    val state = tmpDir("ppl-state")
    val ckpt = tmpDir("ppl-ckpt")
    def doc(id: Long, text: String) =
      s"""{"doc_id":$id,"lang":"en","text":"$text"}"""
    def writeFile(name: String, rows: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(src, name),
        rows.mkString("\n").getBytes("UTF-8"))
      Thread.sleep(5)
    }
    writeFile("b1.json", Seq(doc(1, "alpha beta")))
    writeFile("b2.json", Seq(doc(2, "alpha gamma")))
    val q = StreamOps.perplexitySink(
      StreamOps.readDocumentStream(spark, src, maxFilesPerTrigger = Some(1)),
      state, ckpt).trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    def reports: Map[(Long, Long), (Long, Long, Long)] =
      spark.read.parquet(s"$state/report")
        .select(col("batch").cast("long"), col("doc_id"), col("n_tokens"),
          col("surprisal_total"), col("surprisal_per_tok"))
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    // batch 0: no LM → both tokens at the 1e-6 clamp max (13815510 µnat);
    // batch 1 against LM {alpha:1, beta:1}, N=2: alpha = ⌊ln 2 · 1e6⌋ =
    // 693147, gamma OOV = 13815510
    val want = Map(
      (0L, 1L) -> ((2L, 2 * 13815510L, 13815510L)),
      (1L, 2L) -> ((2L, 693147L + 13815510L, (693147L + 13815510L) / 2)))
    assert(reports == want)
    // stream ≡ batch: the batch-1 report is exactly the batch scorer run
    // against the LM trained on batch 0's docs
    val b1 = Seq((2L, "alpha gamma")).toDF("doc_id", "text")
    val lm = graft.ops.Text.tokenCounts(Seq((1L, "alpha beta"))
      .toDF("doc_id", "text"))
    val viaBatch = graft.ops.Text.unigramSurprisalAgainst(b1, lm)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (1L, r._1) -> ((r._2, r._3, r._4))).toMap
    assert(viaBatch == Map((1L, 2L) -> want((1L, 2L))))
    // crash-replay of the LAST batch: the state read excludes its own
    // batch dir, so the recomputed report is identical
    val b2 = spark.read.schema("doc_id BIGINT, lang STRING, text STRING")
      .json(s"$src/b2.json")
    StreamOps.perplexityDocumentBatch(b2, 1L, state)
    assert(reports == want)
  }

  test("pmiSink: merged stream state reproduces the one-shot collocations; replay idempotent") {
    import org.apache.spark.sql.functions._
    val src = tmpDir("pmi-src")
    val state = tmpDir("pmi-state")
    val ckpt = tmpDir("pmi-ckpt")
    def doc(id: Long, text: String) =
      s"""{"doc_id":$id,"lang":"en","text":"$text"}"""
    def writeFile(name: String, rows: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(src, name),
        rows.mkString("\n").getBytes("UTF-8"))
      Thread.sleep(5)
    }
    writeFile("b1.json", Seq(doc(1, "a b c a b"), doc(2, "b c d")))
    writeFile("b2.json", Seq(doc(3, "a b a b"), doc(4, "c d e f")))
    val q = StreamOps.pmiSink(
      StreamOps.readDocumentStream(spark, src, maxFilesPerTrigger = Some(1)),
      state, ckpt, window = 2).trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    val fullDocs = Seq((1L, "a b c a b"), (2L, "b c d"),
      (3L, "a b a b"), (4L, "c d e f")).toDF("doc_id", "text")
    def streamed = StreamOps.pmiTopK(spark, state, topK = 100, minCount = 2)
      .collect().toSeq
    val oneShot = graft.ops.Text.pmiPairs(fullDocs, window = 2,
      topK = 100, minCount = 2).collect().toSeq
    assert(streamed.nonEmpty && streamed == oneShot)

    // crash-replay of the LAST batch: the rewrite lands in exactly its own
    // batch dir, so the merged state — and the report — is unchanged
    val b2 = spark.read.schema("doc_id BIGINT, lang STRING, text STRING")
      .json(s"$src/b2.json")
    StreamOps.pmiDocumentBatch(b2, 1L, state, window = 2)
    assert(streamed == oneShot)
  }

  test("cmsSink: merged stored sketches reproduce the one-pass heavy hitters; replay idempotent") {
    import org.apache.spark.sql.functions._
    import graft.ops.Sketch
    val state = tmpDir("cms-state")
    val all = (1 to 400).map(i => (i.toLong, (i % 7).toLong))
      .toDF("event_id", "user_id")
    // two batches via the public per-batch entry (the sink wraps exactly
    // this in foreachBatch; the streaming wiring is pinned by the other
    // sinks' tests — here the contract under test is the STATE)
    StreamOps.cmsBatch(all.filter($"event_id" % 2 === 0), 0L, state,
      col("user_id"), 0.001, 0.99, 42)
    StreamOps.cmsBatch(all.filter($"event_id" % 2 =!= 0), 1L, state,
      col("user_id"), 0.001, 0.99, 42)
    def stored = Sketch.heavyHittersCmsStored(spark, state, all,
        col("user_id"), k = 5).collect().map(_.toSeq).toSet
    val onePass = Sketch.heavyHittersCms(all, col("user_id"), k = 5)
      .collect().map(_.toSeq).toSet
    assert(stored == onePass && onePass.nonEmpty)
    // every verdict is TRUE (the merged sketch keeps the error contract)
    assert(onePass.forall(_.last == true))
    // crash-replay of the last batch: same dir overwritten, state unchanged
    StreamOps.cmsBatch(all.filter($"event_id" % 2 =!= 0), 1L, state,
      col("user_id"), 0.001, 0.99, 42)
    assert(stored == onePass)
  }

  test("watermarkTumblingModel: batch model emits exactly what real withWatermark append drops/keeps") {
    import org.apache.spark.sql.functions._
    val dir = tmpDir("late-events")
    def ev(id: Long, ts: String, tpe: String, v: Double) =
      s"""{"event_id":$id,"ts":"$ts","user_id":1,"event_type":"$tpe","value":$v,"props":"{}"}"""
    def writeFile(name: String, rows: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name),
        rows.mkString("\n").getBytes("UTF-8"))
      Thread.sleep(5) // distinct mtimes → deterministic micro-batch order
    }
    // batch 0: on-time events; max ts 01:25 → model watermark 01:15 after
    writeFile("b0.json", Seq(
      ev(1, "2026-01-01T00:10:00Z", "click", 1.0),
      ev(2, "2026-01-01T00:50:00Z", "click", 2.0),
      ev(3, "2026-01-01T01:25:00Z", "view", 1.0)))
    // batch 1: e11 older than max-seen but its [01:00,02:00) window is
    // still open → KEPT; e12 on-time → advances max to 02:30. This batch
    // also serves as the INTERVENING batch: the engine's watermark commit
    // lags one batch behind the model's documented one-batch contract
    // (eviction is the cutoff — see the test above), so the late arrival
    // below sits ≥2 batches after the advancing data, where BOTH
    // mechanics agree it must drop.
    writeFile("b1.json", Seq(
      ev(11, "2026-01-01T01:20:00Z", "view", 8.0),
      ev(12, "2026-01-01T02:30:00Z", "click", 1.0)))
    // batch 2: late event for the long-closed [00:00,01:00) window —
    // dropped under the model (wm 02:20) and the engine (wm 01:15) alike
    writeFile("b2.json", Seq(ev(21, "2026-01-01T00:20:00Z", "click", 4.0)))
    // batch 3: flush sentinel pushes the final watermark past every real
    // window so append mode emits them all; its own window stays open
    writeFile("b3.json", Seq(ev(31, "2026-01-01T12:00:00Z", "sentinel", 0.0)))

    val streamed = runToMemory(
      StreamOps.tumblingCounts(
        StreamOps.readEventStream(spark, dir, maxFilesPerTrigger = Some(1)),
        width = "1 hour", watermark = "10 minutes"),
      "late_tumbling", "append")
      .filter("event_type <> 'sentinel'")
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq

    val batch = spark.read.schema("event_id BIGINT, ts TIMESTAMP, " +
        "user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
      .json(dir)
    val model = StreamOps.watermarkTumblingModel(batch,
        floor(col("event_id") / 10), delaySec = 600L, width = "1 hour")
      .filter("event_type <> 'sentinel'") // model keeps the open window too
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq

    assert(streamed == model)
    // hand-computed: e21 dropped; e11 kept despite arriving after newer data
    val byKey = model.map(r => (r(0), r(1)) -> (r(2), r(3))).toMap
    assert(byKey.size == 3)
    assert(byKey((1767225600L, "click")) == (2L, 3.0))  // 00:00 e1+e2, no e21
    assert(byKey((1767229200L, "view")) == (2L, 9.0))   // 01:00 e3+e11
    assert(byKey((1767232800L, "click")) == (1L, 1.0))  // 02:00 e12
  }

  test("stored-state read sides fail with a descriptive error before the first batch") {
    import org.apache.spark.sql.functions._
    val empty = tmpDir("no-state")
    val eCms = intercept[IllegalArgumentException] {
      graft.ops.Sketch.heavyHittersCmsStored(spark, s"$empty/cms",
        (1 to 3).map(_.toLong).toDF("user_id"), col("user_id"), k = 3)
    }
    assert(eCms.getMessage.contains("no stored sketches"))
    val ePmi = intercept[IllegalArgumentException] {
      StreamOps.pmiTopK(spark, s"$empty/pmi", topK = 5, minCount = 1)
    }
    assert(ePmi.getMessage.contains("no stored PMI state"))
  }

  test("driftSink: batches score against prior histograms only; replay idempotent") {
    import org.apache.spark.sql.functions._
    import graft.ops.Quality
    val src = tmpDir("drift-src")
    val state = tmpDir("drift-state")
    val ckpt = tmpDir("drift-ckpt")
    def doc(id: Long, nToks: Int) =
      s"""{"doc_id":$id,"lang":"en","text":"${Seq.fill(nToks)("w").mkString(" ")}"}"""
    def writeFile(name: String, rows: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(src, name),
        rows.mkString("\n").getBytes("UTF-8"))
      Thread.sleep(5)
    }
    // bucket = token-count decile band, like the catalog query
    val bucket = least(floor(size(split(col("text"), " ")) / 10), lit(9L))
    writeFile("b1.json", Seq(doc(1, 5), doc(2, 15), doc(3, 15)))
    writeFile("b2.json", Seq(doc(4, 5), doc(5, 35)))
    val q = StreamOps.driftSink(
      StreamOps.readDocumentStream(spark, src, maxFilesPerTrigger = Some(1)),
      state, ckpt, bucket, nBuckets = 10)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    def reports: Map[(Long, Long), (Long, Long)] =
      spark.read.parquet(s"$state/report")
        .select(col("batch").cast("long"), col("bucket"), col("ref_n"),
          col("cur_n"))
        .as[(Long, Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val first = reports
    // batch 0 scored against the EMPTY reference; batch 1 against batch 0
    assert(first((0L, 0L)) == ((0L, 1L)) && first((0L, 1L)) == ((0L, 2L)))
    assert(first((1L, 0L)) == ((1L, 1L)) && first((1L, 1L)) == ((2L, 0L)) &&
      first((1L, 3L)) == ((0L, 1L)))
    // batch 1's report equals a direct stored-histogram computation
    val b1 = spark.read.schema("doc_id BIGINT, lang STRING, text STRING")
      .json(s"$src/b1.json")
    val b2 = spark.read.schema("doc_id BIGINT, lang STRING, text STRING")
      .json(s"$src/b2.json")
    val direct = Quality.psiDriftFromCounts(Quality.histogram(b1, bucket),
        b2, bucket, 10).collect().map(_.toSeq).toSet
    val streamed = spark.read.parquet(s"$state/report/batch=1")
      .collect().map(_.toSeq).toSet
    assert(streamed == direct && streamed.nonEmpty)
    // crash-replay of the LAST batch: state read excludes its own dir
    StreamOps.driftDocumentBatch(b2, 1L, state, bucket, nBuckets = 10)
    assert(reports == first)
    assert(spark.read.parquet(s"$state/hist").drop("batch")
      .as[(Long, Long)].collect().toSet ==
      Set((0L, 1L), (1L, 2L), (3L, 1L)))
  }

  test("scd2Sink: streamed batches maintain bucketed history; replay idempotent") {
    import org.apache.spark.sql.functions._
    import graft.ops.History
    val src = tmpDir("scd2-src")
    val root = tmpDir("scd2-root") + "/hist"
    val ckpt = tmpDir("scd2-ckpt")
    def ev(id: Long, t: String, u: Long, typ: String) =
      s"""{"event_id":$id,"ts":"$t","user_id":$u,"event_type":"$typ","value":0.0,"props":"{}"}"""
    def writeFile(name: String, rows: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(src, name),
        rows.mkString("\n").getBytes("UTF-8"))
      Thread.sleep(5)
    }
    writeFile("b1.json", Seq(
      ev(1, "2026-01-01T00:00:00Z", 1, "trial"),
      ev(2, "2026-01-02T00:00:00Z", 1, "trial")))
    writeFile("b2.json", Seq(
      ev(3, "2026-01-03T00:00:00Z", 1, "paid"),
      ev(4, "2026-01-01T00:00:00Z", 2, "trial")))
    val q = StreamOps.scd2Sink(
      StreamOps.readEventStream(spark, src, maxFilesPerTrigger = Some(1)),
      root, ckpt, Seq("user_id"), col("ts"), col("event_id"),
      col("event_type"), nParts = 4)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming query did not terminate within 120s")

    def rowsOf(df: DataFrame): Set[(Long, String, Long, Option[Long], Boolean)] =
      df.select(col("user_id"), col("attr_val"),
          unix_timestamp(col("valid_from")).as("vf"),
          unix_timestamp(col("valid_to")).as("vt"), col("is_current"))
        .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet
    val full = spark.read.schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, props STRING").json(src)
    val expect = rowsOf(History.scd2FromEvents(full, Seq("user_id"),
      col("ts"), col("event_id"), col("event_type")))
    assert(rowsOf(History.readScd2Stored(spark, root)) == expect)

    // crash-replay of the LAST micro-batch: the replay guard drops
    // already-reflected events, so the stored history is unchanged
    val b2 = spark.read.schema(
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, " +
        "value DOUBLE, props STRING").json(s"$src/b2.json")
    History.scd2MergeStored(spark, root, b2, Seq("user_id"), col("ts"),
      col("event_id"), col("event_type"), nParts = 4)
    assert(rowsOf(History.readScd2Stored(spark, root)) == expect)
  }

  test("holtStream: three-long state folds the identical truncating " +
      "recurrence; latest emission equals the batch operator across " +
      "micro-batch boundaries") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir("holt-events")
    def ev(id: Long, sec: Long, uid: Long, v: Double) =
      s"""{"event_id":$id,"ts":"${java.time.Instant.ofEpochSecond(sec)}",""" +
        s""""user_id":$uid,"event_type":"view","value":$v,"props":"{}"}"""
    // the state must carry l/b ACROSS the file boundary
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "p1.json"), Seq(
      ev(1, 0, 1, 1.0), ev(2, 10, 1, 2.0),
      ev(3, 0, 2, 4.0)
    ).mkString("\n").getBytes("UTF-8"))
    Thread.sleep(5)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "p2.json"), Seq(
      ev(4, 20, 1, 4.0)
    ).mkString("\n").getBytes("UTF-8"))
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
      "event_type STRING, value DOUBLE, props STRING"
    val streamed = runToMemory(
      StreamOps.holtStream(spark,
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(dir)),
      "holt", "append")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val latest = streamed.groupBy(_._1).map { case (u, rows) =>
      val r = rows.maxBy(_._2); u -> ((r._2, r._3, r._4, r._5)) }
    val batch = EventOps.holtForecastBp(spark.read.schema(schema).json(dir))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(latest == batch)
    // hand values: u1 after 3 obs — l₂=1.5e6, b₂=1.5e5; t₃: l = (5000·4e6
    // + 5000·1.65e6) div 1e4 = 2825000, b = (3000·1325000 + 7000·150000)
    // div 1e4 = 502500, forecast = 2825000 + 3·502500
    assert(latest(1L) == ((3L, 2825000L, 502500L, 4332500L)))
    assert(latest(2L) == ((1L, 4000000L, 0L, 4000000L)))
  }

  test("ivmViewSink: streamed signed deltas maintain the join view; " +
      "value-only updates survive the fold; replay idempotent") {
    import org.apache.spark.sql.functions._
    val src = tmpDir("ivm-src")
    val state = tmpDir("ivm-state")
    val ckpt = tmpDir("ivm-ckpt")
    val dim = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("rk", "grp")
    val baseL = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("lk", "v")
    val base = graft.ops.Ivm.viewPartial(
      baseL.join(dim, col("lk") === col("rk")), Seq("grp"), col("v"))
    def writeFile(name: String, rows: Seq[String]): Unit = {
      java.nio.file.Files.write(java.nio.file.Paths.get(src, name),
        rows.mkString("\n").getBytes("UTF-8"))
      Thread.sleep(5)
    }
    // b1: insert; b2: a VALUE-ONLY update (net n_rows 0, sum_v +2 — the
    // partial a count-keyed fold would wrongly drop); b3: retract group
    // b's only row
    writeFile("b1.json", Seq("""{"lk":2,"v":5,"sign":1}"""))
    writeFile("b2.json", Seq("""{"lk":1,"v":10,"sign":-1}""",
      """{"lk":1,"v":12,"sign":1}"""))
    writeFile("b3.json", Seq("""{"lk":3,"v":30,"sign":-1}"""))
    def runOnce(): Unit = {
      val q = StreamOps.ivmViewSink(
        spark.readStream.schema("lk BIGINT, v BIGINT, sign BIGINT")
          .option("maxFilesPerTrigger", 1).json(src),
        dim, state, ckpt, Seq("grp"), "lk", "rk", col("v"), foldEvery = 2)
        .trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "streaming query did not terminate")
    }
    runOnce()
    def served: Map[String, (Long, Long)] =
      graft.ops.Ivm.mergeView(base,
          graft.ops.Ivm.readViewDeltas(spark, state), Seq("grp"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
    // truth = full recompute over the applied rows:
    // a: (1,12),(2,20),(2,5) → (3, 37); b: retracted away entirely
    assert(served == Map("a" -> ((3L, 37L))))
    // the fold ran (foldEvery=2) and kept the value-only-update partial
    val dirs = new java.io.File(state).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("batch=")).sorted
    assert(dirs.length < 3 && dirs.contains("batch=0"))
    // crash-replay of the LAST batch id: own-dir overwrite → unchanged
    val lastId = dirs.map(_.stripPrefix("batch=").toLong).max
    val b3 = spark.read.schema("lk BIGINT, v BIGINT, sign BIGINT")
      .json(s"$src/b3.json")
    StreamOps.ivmDeltaBatch(b3, lastId, dim, state, Seq("grp"),
      "lk", "rk", col("v"), foldEvery = 2)
    assert(served == Map("a" -> ((3L, 37L))))
    // restart with a fourth file: checkpoint resumes and extends
    writeFile("b4.json", Seq("""{"lk":3,"v":7,"sign":1}"""))
    runOnce()
    assert(served == Map("a" -> ((3L, 37L)), "b" -> ((1L, 7L))))
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
