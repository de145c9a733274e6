package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.{FileSourceScanExec, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan contracts: the scale-critical physical-plan properties each flagship
  * query must keep. A correctness oracle cannot see these — a query can go
  * quadratic or single-task and still return the right rows at sf0.01 —
  * so they are pinned here against the INITIAL physical plan (cheap: no
  * execution needed; the properties checked only disappear at runtime,
  * never appear).
  */
class PlanContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): SparkPlan = df.queryExecution.sparkPlan
  private def q(name: String): SparkPlan =
    plan(SparkEntry.queries(name)(spark, dir))

  test("entry: dimension joins broadcast, scan prunes columns") {
    val p = plan(SparkEntry.entry(spark))
    assert(p.collect { case j: BroadcastHashJoinExec => j }.size >= 3,
      "regional revenue must broadcast its dimension tables")
    val liScans = p.collect {
      case s: FileSourceScanExec if s.relation.location.inputFiles
        .exists(_.contains("lineitem")) => s
    }
    assert(liScans.nonEmpty)
    // projection pruning must reach the reader: the fact scan reads a
    // handful of columns, never the full 16-column lineitem schema
    assert(liScans.forall(_.schema.fields.length <= 6),
      s"lineitem ReadSchema too wide: ${liScans.map(_.schema.simpleString)}")
  }

  test("banded similarity queries contain NO nested-loop join") {
    Seq("dedup_embedding_cosine", "sim_ann_lsh", "dedup_minhash",
      "dedup_ngram_jaccard", "curate_decontaminate").foreach { name =>
      val bnl = q(name).collect { case j: BroadcastNestedLoopJoinExec => j }
      assert(bnl.isEmpty, s"$name plans a BroadcastNestedLoopJoin")
    }
  }

  test("no unpartitioned window over data-sized input anywhere in the catalog") {
    // agg_percentiles previously planned Window.orderBy(v) with no
    // partitionBy — one task sorting every distinct value. Global windows
    // are banned outright: every WindowExec must carry a partition spec.
    Seq("agg_percentiles", "agg_percentiles_by", "window_rank_rownum",
      "sort_topk_limit", "dedup_ngram_jaccard", "pipeline_corpus_clean",
      "curate_pack_budget", "curate_lang_cap", "curate_stratified_n").foreach { name =>
      val global = q(name).collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
      assert(global.isEmpty, s"$name plans an unpartitioned window")
    }
  }

  test("top-k limits push below the sort") {
    val p = q("sort_topk_limit")
    assert(p.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
      "global top-k must plan TakeOrderedAndProject, not sort-then-limit")
  }
}
