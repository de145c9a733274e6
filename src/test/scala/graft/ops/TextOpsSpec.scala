package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit cases for text operators whose edge shapes the corpus oracle never
  * exercises (degenerate documents).
  */
class TextOpsSpec extends SparkSpec {

  import spark.implicits._

  test("repetitionMetrics: known gram shares, single-token and repeated docs") {
    val docs = Seq(
      (1L, "a a a b"),        // unigrams a:3/4 → 7500; bigrams "a a"x2 of 3 → 6666
      (2L, "one two three"),  // all grams unique → 3333 / 5000
      (3L, "solo"),           // one token → 10000; no bigrams → 0
      (4L, "x x x x")         // degenerate loop → 10000 / 10000
    ).toDF("doc_id", "text")
    val out = Text.repetitionMetrics(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("top_token_bp"), r.getAs[Long]("top_bigram_bp"))).toMap
    assert(out(1L) == (7500L, 6666L))
    assert(out(2L) == (3333L, 5000L))
    assert(out(3L) == (10000L, 0L))
    assert(out(4L) == (10000L, 10000L))
  }
}
