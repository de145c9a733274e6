package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curation operators: determinism and stability properties that matter at
  * scale — membership must be a pure function of the key, never of
  * partitioning, run order, or corpus size.
  */
class CurateSpec extends SparkSpec {

  import spark.implicits._

  private def ids(n: Int, parts: Int): DataFrame =
    (1L to n.toLong).toDF("doc_id").repartition(parts)

  test("hashSplit: total, partition-invariant, fractions near targets") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def assignments(parts: Int): Map[Long, String] =
      Curate.hashSplit(ids(1000, parts), col("doc_id"), splits)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
    val a1 = assignments(1)
    assert(a1.size == 1000) // every row assigned exactly once
    assert(assignments(13) == a1) // partitioning cannot move a row
    val counts = a1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 800) < 60)
    assert(math.abs(counts("val") - 100) < 40)
    assert(math.abs(counts("test") - 100) < 40)
  }

  test("hashSplit membership is stable when the corpus grows") {
    val splits = Seq("train" -> 0.9, "holdout" -> 0.1)
    val small = Curate.hashSplit(ids(300, 4), col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val large = Curate.hashSplit(ids(1000, 4), col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(small.forall { case (id, s) => large(id) == s })
  }

  test("hashSample: deterministic subset, stable under growth, near the rate") {
    val small = Curate.hashSample(ids(300, 3), col("doc_id"), 0.2)
      .as[Long].collect().toSet
    val large = Curate.hashSample(ids(1000, 7), col("doc_id"), 0.2)
      .as[Long].collect().toSet
    assert(small == large.filter(_ <= 300L)) // growth never reshuffles
    assert(math.abs(large.size - 200) < 60)
  }

  test("benchmarkOverlap flags only the planted near-copy") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // near-copy of bench
      (2L, "completely unrelated text about spark physical plans"),
      (3L, "alpha beta gamma something else entirely here now")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta iota")
    ).toDF("doc_id", "text")
    val out = Curate.benchmarkOverlap(docs, bench, n = 3, minShared = 3)
      .select("doc_id", "bench_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 100L, 5L))) // 5 shared 3-grams; doc 3 shares only 1
  }

  test("redactPii masks emails and long digit runs, leaves the rest") {
    val out = Seq("contact me at jane.doe+x@mail.example.org or call 5551234567 ext 42")
      .toDF("text").select(Curate.redactPii(col("text"))).as[String].head()
    assert(out == "contact me at <EMAIL> or call <NUM> ext 42")
  }
}
