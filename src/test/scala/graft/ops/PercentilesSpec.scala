package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit coverage for the distributed nearest-rank percentile operator
  * (the catalog's agg_percentiles oracle proves it against DuckDB on
  * numeric data; these cases pin the type-dependent bucketing contract).
  */
class PercentilesSpec extends SparkSpec {

  import spark.implicits._

  test("numeric values: exact nearest-rank selection across buckets") {
    // 1..100, one row each: rank floor(q*99)+1 → p25=25, p50=50, p90=90
    val df = spark.range(1, 101).toDF("v")
    val out = Relational.nearestRankPercentiles(df, col("v"), Seq(0.25, 0.5, 0.9))
      .collect().map(r => r.getDouble(0) -> r.getAs[Long]("value")).toMap
    assert(out == Map(0.25 -> 25L, 0.5 -> 50L, 0.9 -> 90L))
  }

  test("repeated values: ranks resolve inside a value's count span") {
    val df = Seq(1, 1, 1, 1, 2, 2, 3, 9, 9, 9).toDF("v")
    val out = Relational.nearestRankPercentiles(df, col("v"), Seq(0.0, 0.5, 1.0))
      .collect().map(r => r.getDouble(0) -> r.getAs[Int]("value")).toMap
    // ranks: floor(q*9)+1 → 1, 5, 10 → values 1, 2, 9
    assert(out == Map(0.0 -> 1, 0.5 -> 2, 1.0 -> 9))
  }

  test("STRING values rank lexicographically — double-cast bucketing must not engage") {
    // "1".."15": lexicographic order is 1,10,11,12,13,14,15,2,...,9 — a
    // numeric-looking string casts cleanly to double, so boundary-derived
    // buckets would order numerically and return the wrong rank-8 median
    // ("8" instead of "2"). The operator must degrade strings to a single
    // bucket and keep native ordering.
    val df = (1 to 15).map(_.toString).toDF("v")
    val out = Relational.nearestRankPercentiles(df, col("v"), Seq(0.5))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("value") == "2",
      s"median of lexicographic ranks must be '2', got '${out.head.get(1)}'")
  }
}
