package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: min-of-N cold-cache timing of named catalog queries at sf0.1
  * (mirrors Bench's re-time discipline; delete after use). */
object ScratchPR {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt).getOrElse(3)
    val names = if (args.nonEmpty) args.toSeq
      else Seq("graph_pagerank", "sim_knn_graph", "dedup_containment",
        "curate_dsir_select", "agg_outlier_mad")
    names.foreach { n =>  // codegen warmup at sf0.001
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
    }
    names.foreach { name =>
      val ts = (1 to runs).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[pr] $name%-24s min=${ts.min}%6.2f  runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
