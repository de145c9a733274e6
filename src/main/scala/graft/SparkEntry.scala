package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory lives in `graft.catalog.*` (one object per operator
  * family, each pairing the Spark program with its DuckDB oracle SQL);
  * SparkEntry is the aggregation point the driver calls.
  */
object SparkEntry {

  private val catalogs: Seq[Catalog] =
    Seq(RelationalQueries, FunctionQueries, TextQueries, VectorQueries,
      CurateQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * revenue per region — scan → 4 joins (dims broadcast) → agg → sort.
    */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.regionalRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose semantics are not
    * SQL-expressible cross-engine (e.g. HLL sketches) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    catalogs.flatMap(_.oracleSql).toMap
}
