package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking-fusion operators — the glue between the lexical (BM25, token
  * Jaccard) and dense (cosine/ANN) retrieval surfaces: hybrid retrieval
  * runs both and fuses the rank lists, which is robust to either side's
  * score-scale quirks because fusion reads only the RANKS.
  */
object Retrieval {

  /** Reciprocal-rank fusion of any number of `(qid, id, rank)` rankings:
    * fused score = Σ over rankings of `1_000_000 div (k + rank)` — the
    * standard RRF with the 1/(k+r) contributions floor-scaled to
    * integers, so the sum is reduction-order-free and cross-engine exact
    * (float RRF sums depend on addition order). An (qid, id) absent from
    * a ranking simply contributes nothing. Ties on the fused score break
    * on the id.
    *
    * Scale shape: one union of the O(queries·k) rank lists, one keyed
    * aggregate, one per-query window over ≤ Σk candidates — nothing is
    * corpus-sized.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60,
              topK: Int = 5): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(k >= 0, s"k must be >= 0, got $k")
    require(topK > 0, s"topK must be positive, got $topK")
    val u = rankings
      .map(_.select(col("qid"), col("id"), col("rank").cast("long").as("rank")))
      .reduce(_ unionByName _)
    val scored = u
      .select(col("qid"), col("id"),
        expr(s"1000000 div ($k + rank)").as("_c"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("_c")).as("rrf_score"), count(lit(1)).as("n_rankers"))
    Relational.topKPerGroup(scored, Seq(col("qid")),
      Seq(col("rrf_score").desc, col("id").asc), topK, rankCol = "rank")
  }

  /** Maximal-Marginal-Relevance re-ranking (Carbonell & Goldstein 1998):
    * greedily pick `selectK` results per query, each round's pick maximizing
    * `λ·rel(q,d) − (1−λ)·max_{s∈picked} sim(d,s)` — relevance traded
    * against redundancy, the diversity re-rank every RAG stack bolts onto
    * its retriever. Inputs are score frames, not vectors — `cand(query_id,
    * neighbor_id, rel)` is the retriever's pool, `pairSims(query_id, a, b,
    * sim)` the within-pool similarities (both pre-rounded 6dp by the
    * caller) — so the op composes with any retrieval surface, like
    * `rrfFuse`.
    *
    * Determinism: score = round6(λ·rel − (1−λ)·max sim); ties break on
    * neighbor_id. `1−λ` is computed as the Scala double `1.0 - λ` and the
    * oracle writes literally `(1::DOUBLE - λ::DOUBLE)` so both engines
    * bake the identical IEEE constant (0.7 → 0.30000000000000004 — NOT
    * the decimal literal 0.3).
    *
    * Scale shape: the sequential-greedy recurrence is inherently K
    * rounds, but each round is pool-sized keyed work (anti-join + max-sim
    * aggregate + per-query argmax window over ≤ poolK rows per query) —
    * nothing corpus-sized moves after the retriever built the pool. Each
    * round `localCheckpoint`s the selection (kCore discipline: the round
    * references it three times, a lazy chain would grow the plan ~3×
    * per round).
    */
  def mmrRerank(cand: DataFrame, pairSims: DataFrame, selectK: Int,
                lam: Double): DataFrame = {
    require(selectK >= 1, s"selectK must be >= 1, got $selectK")
    require(lam >= 0.0 && lam <= 1.0, s"lambda must be in [0,1], got $lam")
    import org.apache.spark.sql.expressions.Window
    val c = cand.select(col("query_id"), col("neighbor_id"), col("rel"))
      .localCheckpoint()
    val p = pairSims.select(col("query_id"), col("a"), col("b"), col("sim"))
      .localCheckpoint()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("neighbor_id"))
    var selected = c.select(col("query_id"), col("neighbor_id"),
      lit(1).as("pick"), lit(0.0).as("score")).limit(0).localCheckpoint()
    for (r <- 1 to selectK) {
      val rem = c.join(selected.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_anti")
      val ms = p.join(selected.select(col("query_id"),
          col("neighbor_id").as("b")), Seq("query_id", "b"))
        .groupBy(col("query_id"), col("a")).agg(max(col("sim")).as("ms"))
      val pickR = rem.join(ms.select(col("query_id"),
          col("a").as("neighbor_id"), col("ms")),
          Seq("query_id", "neighbor_id"), "left")
        .withColumn("score", Vectors.round6(lit(lam) * col("rel")
          - lit(1.0 - lam) * coalesce(col("ms"), lit(0.0))))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("query_id"), col("neighbor_id"), lit(r).as("pick"),
          col("score"))
      selected = selected.unionByName(pickR).localCheckpoint()
    }
    selected
  }
}
