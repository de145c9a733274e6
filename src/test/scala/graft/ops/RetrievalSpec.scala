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

  test("mmrRerank: diversity beats redundancy; exhausted pool stops early") {
    // one query, candidates a(rel .9), b(.8), c(.5); a~b nearly duplicate
    // (sim .9), c orthogonal. Greedy λ=.7: pick a, then c BEATS the
    // higher-relevance b (b's redundancy penalty .3·.9), then b last.
    val cand = Seq((1L, 10L, 0.9), (1L, 11L, 0.8), (1L, 12L, 0.5))
      .toDF("query_id", "neighbor_id", "rel")
    val sims = Seq(
      (1L, 10L, 11L, 0.9), (1L, 11L, 10L, 0.9),
      (1L, 10L, 12L, 0.0), (1L, 12L, 10L, 0.0),
      (1L, 11L, 12L, 0.0), (1L, 12L, 11L, 0.0))
      .toDF("query_id", "a", "b", "sim")
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val got = Retrieval.mmrRerank(cand, sims, selectK = 3, lam = 0.7)
      .select(col("query_id"), col("pick"), col("neighbor_id"), col("score"))
      .as[(Long, Int, Long, Double)].collect().sortBy(_._2)
    assert(got.map(t => (t._2, t._3)).toSeq ==
      Seq((1, 10L), (2, 12L), (3, 11L)))
    assert(got(0)._4 == r6(0.7 * 0.9))
    assert(got(1)._4 == r6(0.7 * 0.5 - (1.0 - 0.7) * 0.0))
    assert(got(2)._4 == r6(0.7 * 0.8 - (1.0 - 0.7) * 0.9))
    // selectK beyond the pool: rounds past exhaustion emit nothing
    assert(Retrieval.mmrRerank(cand, sims, selectK = 5, lam = 0.7)
      .count() == 3)
    // λ=1: pure relevance order, no penalty
    assert(Retrieval.mmrRerank(cand, sims, selectK = 3, lam = 1.0)
      .orderBy("pick").select("neighbor_id")
      .as[Long].collect().toSeq == Seq(10L, 11L, 12L))
  }
}
