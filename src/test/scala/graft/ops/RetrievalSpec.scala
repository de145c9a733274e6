package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  test("rrfFuse: contributions sum across rankers, ties break on id") {
    // ranker 1: q1 → A(1), B(2); ranker 2: q1 → B(1), C(2)
    val r1 = Seq(("q1", "A", 1L), ("q1", "B", 2L)).toDF("qid", "id", "rank")
    val r2 = Seq(("q1", "B", 1L), ("q1", "C", 2L)).toDF("qid", "id", "rank")
    // k=0: contrib = 1e6 div rank → A: 1e6; B: 5e5 + 1e6; C: 5e5
    val got = Retrieval.rrfFuse(Seq(r1, r2), k = 0, topK = 3)
      .select(col("id"), col("rrf_score"), col("n_rankers"), col("rank"))
      .as[(String, Long, Long, Int)].collect().sortBy(_._4)
    assert(got.toSeq == Seq(
      ("B", 1500000L, 2L, 1), ("A", 1000000L, 1L, 2), ("C", 500000L, 1L, 3)))
  }

  test("rrfFuse: per-query isolation and topK cut") {
    val r1 = Seq(("q1", "A", 1L), ("q2", "X", 1L), ("q2", "Y", 2L))
      .toDF("qid", "id", "rank")
    val got = Retrieval.rrfFuse(Seq(r1), k = 60, topK = 1)
      .select(col("qid"), col("id")).as[(String, String)].collect().toSet
    assert(got == Set(("q1", "A"), ("q2", "X")))
  }
}
