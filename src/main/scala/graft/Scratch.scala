package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling scratchpad (not part of the shipped surface).
  * Times the perf-sensitive queries at sf0.1 and prints their FINAL
  * adaptive plans (after AQE stage reuse), which is what actually runs —
  * `explain` before execution shows the initial plan only.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"

    val picks = Seq("graph_pagerank", "sim_knn_graph", "dedup_containment",
      "curate_dsir_select", "agg_outlier_mad")
    // untimed warmup at sf0.001 — session/codegen costs out of the numbers
    picks.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
    }
    picks.foreach { name =>
      // cold-cache like Bench's re-time: CacheManager matches canonicalized
      // plans ACROSS queries, so without this an earlier query's persisted
      // frames silently serve a later one and the timing lies.
      spark.catalog.clearCache()
      // time CONSTRUCTION too — operators with eager materialization
      // (nearDupClusters' pairs.count) do their heavy work inside fn(),
      // which is exactly what Bench times.
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val n = df.count()
      println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
