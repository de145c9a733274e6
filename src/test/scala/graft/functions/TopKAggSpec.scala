package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {

  import spark.implicits._
  import TopKAgg.{Entry, TopK, TopKMaxAgg}

  test("TopKMaxAgg: (v DESC, id ASC) order, boundary rejects, tie by id") {
    val agg = new TopKMaxAgg(3)
    val b = Seq(Entry(5, 10), Entry(9, 4), Entry(5, 2), Entry(1, 1),
      Entry(9, 7)).foldLeft(agg.zero)(agg.reduce)
    assert(b.entries == Seq(Entry(9, 4), Entry(9, 7), Entry(5, 2)))
    // equal v, LARGER id than the boundary entry → rejected
    assert(agg.reduce(b, Entry(5, 3)).entries == b.entries)
    // equal v, smaller id → evicts the boundary
    assert(agg.reduce(b, Entry(5, 1)).entries ==
      Seq(Entry(9, 4), Entry(9, 7), Entry(5, 1)))
  }

  test("merge: k-bounded sorted-run merge, commutative, zero identity") {
    val agg = new TopKMaxAgg(3)
    val a = TopK(Vector(Entry(9, 1), Entry(7, 2), Entry(5, 3)))
    val b = TopK(Vector(Entry(8, 4), Entry(7, 1), Entry(2, 5)))
    val want = Seq(Entry(9, 1), Entry(8, 4), Entry(7, 1))
    assert(agg.merge(a, b).entries == want)
    assert(agg.merge(b, a).entries == want)
    assert(agg.merge(a, agg.zero).entries == a.entries)
  }

  test("grouped top-k ≡ the window form, partition-invariant, and the " +
      "plan has NO WindowExec — partial aggregation only") {
    val df = (1L to 2000L).map(i => (i % 5, (i * 37) % 500, i))
      .toDF("g", "v", "id")
    def viaAgg(d: org.apache.spark.sql.DataFrame) = d.groupBy(col("g"))
      .agg(TopKAgg.topKMax(col("v"), col("id"), 4).as("t"))
      .select(col("g"), posexplode(col("t.entries")))
      .select(col("g"), (col("pos") + 1).as("rank"),
        col("col.v").as("v"), col("col.id").as("id"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("id").asc)
    val viaWindow = df.withColumn("rank", row_number().over(win))
      .filter(col("rank") <= 4)
      .select(col("g"), col("rank").cast("int"), col("v"), col("id"))
      .as[(Long, Int, Long, Long)].collect().toSet
    val got = viaAgg(df).as[(Long, Int, Long, Long)].collect().toSet
    assert(got == viaWindow)
    assert(viaAgg(df.repartition(13)).as[(Long, Int, Long, Long)]
      .collect().toSet == viaWindow, "partitioning moved a row")
    // the scale contract: no per-group full sort anywhere in the plan
    // (descend through the AQE wrapper — collect() does not)
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        nodes(a.executedPlan)
      case other => Seq(other)
    }.flatten
    val plan = nodes(viaAgg(df).queryExecution.executedPlan)
    assert(!plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "grouped top-k must not plan a Window")
    assert(plan.count {
      case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
      case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
      case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
      case _ => false
    } >= 2, "expected a partial + final aggregation pair")
  }

  test("k larger than any group keeps every row in order") {
    val df = Seq((1L, 3L, 1L), (1L, 9L, 2L), (1L, 3L, 0L)).toDF("g", "v", "id")
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topKMax(col("v"), col("id"), 10).as("t"))
      .select(col("t.entries")).as[Seq[(Long, Long)]].head()
    assert(got == Seq((9L, 2L), (3L, 0L), (3L, 1L)))
    intercept[IllegalArgumentException](new TopKMaxAgg(0))
  }
}
