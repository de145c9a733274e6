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
}
