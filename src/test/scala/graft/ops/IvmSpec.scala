package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ops/Ivm — bilinear delta-rule view maintenance. The catalog pair
  * (`ivm_join_agg`, `ivm_join_agg_stored`) pins the algebra against the
  * DuckDB full-recompute oracle at corpus scale; these specs pin the edge
  * semantics on a hand-traced example where every delta kind appears at
  * once: insert, delete, update, a group move, a row whose LEFT AND RIGHT
  * parents both changed, and a group that telescopes to empty.
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  // L(lk, v):            R(rk, grp):
  //   (1,10) (1,20)        (1,"a") (2,"a") (3,"b")
  //   (2,30) (3,40)
  private def lOld = Seq((1L, 10L), (1L, 20L), (2L, 30L), (3L, 40L))
    .toDF("lk", "v")
  private def rOld = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("rk", "grp")

  // ΔL: insert (2,5); update (1,10)→(1,11); delete (3,40)
  private def dL = Seq(
    (2L, 5L, 1L), (1L, 10L, -1L), (1L, 11L, 1L), (3L, 40L, -1L))
    .toDF("lk", "v", "sign")
  // ΔR: rk=2 group move a→c; rk=1 a→d (so (1,11) is DOUBLY updated);
  //     rk=3 deleted (group b must vanish entirely)
  private def dR = Seq(
    (2L, "a", -1L), (2L, "c", 1L), (1L, "a", -1L), (1L, "d", 1L),
    (3L, "b", -1L)).toDF("rk", "grp", "sign")

  // Post-update truth: L' = (1,11),(1,20),(2,30),(2,5); R' = (1,d),(2,c)
  private def lNew = Seq((1L, 11L), (1L, 20L), (2L, 30L), (2L, 5L))
    .toDF("lk", "v")
  private def rNew = Seq((1L, "d"), (2L, "c")).toDF("rk", "grp")

  private def maintained(pushKeys: Boolean = true,
                         maxPushKeys: Int = Ivm.DefaultMaxPushKeys): DataFrame = {
    val oldView = Ivm.viewPartial(
      lOld.join(rOld, col("lk") === col("rk")), Seq("grp"), col("v"))
    Ivm.mergeView(oldView,
      Ivm.viewPartial(
        Ivm.deltaJoin2(lOld, dL, rOld, dR, "lk", "rk", pushKeys, maxPushKeys),
        Seq("grp"), col("v"), col("sign")),
      Seq("grp"))
  }

  private def asMap(df: DataFrame): Map[String, (Long, Long)] =
    df.collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("maintained view ≡ full recompute across insert/delete/update/" +
      "group-move/double-update; emptied groups dropped") {
    val truth = asMap(Ivm.viewPartial(
      lNew.join(rNew, col("lk") === col("rk")), Seq("grp"), col("v")))
    assert(truth == Map("d" -> (2L, 31L), "c" -> (2L, 35L)))
    assert(asMap(maintained()) == truth)
    // groups a (moved away) and b (all rows retracted) must be ABSENT,
    // not present with zero counts
    assert(!maintained().collect().map(_.getString(0)).contains("a"))
    assert(!maintained().collect().map(_.getString(0)).contains("b"))
  }

  test("the ΔL⋈ΔR cross term is load-bearing: dropping it double-counts " +
      "the doubly-updated row") {
    // deltaJoin2 WITHOUT the cross term = only the two single-sided terms
    val twoTerms = broadcast(dL).join(rOld, col("lk") === col("rk"))
      .select(col("lk"), col("v"), col("rk"), col("grp"), col("sign"))
      .unionByName(lOld.join(broadcast(dR), col("lk") === col("rk"))
        .select(col("lk"), col("v"), col("rk"), col("grp"), col("sign")))
    val wrong = asMap(Ivm.mergeView(
      Ivm.viewPartial(lOld.join(rOld, col("lk") === col("rk")),
        Seq("grp"), col("v")),
      Ivm.viewPartial(twoTerms, Seq("grp"), col("v"), col("sign")),
      Seq("grp")))
    val truth = asMap(maintained())
    assert(wrong != truth, "cross term omitted yet answers agree — the " +
      "fixture no longer overlaps deltas on both sides")
  }

  test("empty deltas are identity; empty-keyed prune short-circuits") {
    val empty = dL.limit(0)
    val out = Ivm.mergeView(
      Ivm.viewPartial(lOld.join(rOld, col("lk") === col("rk")),
        Seq("grp"), col("v")),
      Ivm.viewPartial(
        Ivm.deltaJoin2(lOld, empty, rOld, dR.limit(0), "lk", "rk"),
        Seq("grp"), col("v"), col("sign")),
      Seq("grp"))
    assert(asMap(out) == Map("a" -> (3L, 60L), "b" -> (1L, 40L)))
  }

  test("isin pushdown cap falls back to plain broadcast join, same answer") {
    assert(asMap(maintained(pushKeys = true, maxPushKeys = 1)) ==
      asMap(maintained(pushKeys = false)))
    assert(asMap(maintained(pushKeys = false)) == asMap(maintained()))
  }

  test("all three delta terms broadcast — no sort-merge join in the plan") {
    val plan = Ivm.deltaJoin2(lOld, dL, rOld, dR, "lk", "rk")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("delta frames must carry a sign column") {
    intercept[IllegalArgumentException] {
      Ivm.deltaJoin2(lOld, lOld, rOld, dR, "lk", "rk")
    }
  }
}
