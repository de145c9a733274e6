package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling scratchpad (not part of the shipped surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    import graft.ops.{Dedup, Text}
    val dir = "/root/testdata/sf0.1"
    val docs = graft.tables.Tables.load(spark, dir, "documents")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    import org.apache.spark.sql.expressions.Window
    val t = docs.select(col("doc_id").as("id"), col("lang"),
      Dedup.shingles(col("text"), 3).as("sh"))
    val ex = t.select(col("id"), col("lang"), explode(col("sh")).as("s"),
      size(col("sh")).as("n"))
    val dfreq = ex.groupBy("s").agg(count(lit(1)).as("df"))
    val prefix = ex.join(dfreq, "s")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("s"))))
      .filter(col("rk") <= floor(lit(0.4) * col("n")) + 1)
      .select(col("id"), col("lang"), col("s"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.lang") === col("b.lang") && col("a.s") === col("b.s") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("i"), col("b.id").as("j")).distinct()

    println("=== ENTRY PLAN ===")
    SparkEntry.entry(spark).explain("formatted")
    println("=== PRUNING: quality over documents (text needed) ===")
    SparkEntry.queries("text_lang_stats")(spark, dir).explain("formatted")
    println("=== JOIN: inner equi ===")
    SparkEntry.queries("join_inner_equi")(spark, dir).explain("formatted")
    spark.stop()
  }
}
