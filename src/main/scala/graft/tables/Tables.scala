package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-supplied Parquet corpus (see /root/repo/TESTDATA.md).
  *
  * Design note (scale): all reads go through `spark.read.parquet`, so Catalyst
  * gets a relation with pushdown-capable scan — filters and column pruning
  * written downstream reach the Parquet reader (verify with
  * `.explain("formatted")`: `PushedFilters`, `ReadSchema`). At cluster scale
  * the same call works on a directory of thousands of files; nothing here
  * assumes a single file.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables a planner should broadcast in joins. */
  val Dims: Set[String] = Set("region", "nation", "supplier")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) in Parquet, which Spark rejects
      // ([PARQUET_TYPE_ILLEGAL]). Read nanos as LONG, then truncate to
      // microsecond TimestampType (integer `div` — no double precision loss;
      // matches DuckDB's own ns→µs truncation, TESTDATA/FIXTURES note).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every corpus table as a temp view so `spark.sql` text queries
    * (grouping sets, etc.) see the same names the DuckDB oracle uses.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    All.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
