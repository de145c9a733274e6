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

  test("percentileState: batch partials merge to the full-recompute percentiles") {
    val rows = Seq(("a", 10), ("a", 20), ("a", 20), ("a", 30), ("a", 90),
      ("b", 5), ("b", 5), ("b", 7)).zipWithIndex
      .map { case ((g, v), i) => (g, v, i) }
    val df = rows.toDF("g", "v0", "i")
    val full = Relational.nearestRankPercentilesBy(df, Seq("g"), col("v0"),
        Seq(0.5, 0.9)).collect().map(_.toSeq).toSet
    // three arbitrary batches by row index; merged state must agree
    val parts = (0 to 2).map(i => Relational.percentileState(
      df.filter(col("i") % 3 === i), Seq("g"), col("v0")))
    val merged = Relational.mergePercentileState(
      parts.reduce(_ unionByName _), Seq("g"))
    val inc = Relational.nearestRankPercentilesFromCounts(merged, Seq("g"),
        Seq(0.5, 0.9)).collect().map(_.toSeq).toSet
    assert(inc == full && inc.nonEmpty)
    // the merged state really is the unioned frequency table
    val st = merged.as[(String, Int, Long)].collect().toSet
    assert(st == Set(("a", 10, 1L), ("a", 20, 2L), ("a", 30, 1L),
      ("a", 90, 1L), ("b", 5, 2L), ("b", 7, 1L)))
  }

  test("interpolatedPercentiles: bracketing, ties, and single-row edges") {
    def pct(vals: Seq[Int], qs: Seq[Double]): Map[Double, Double] =
      Relational.interpolatedPercentiles(vals.toDF("v"), col("v"), qs)
        .as[(Double, Double)].collect().toMap
    // n=1: every quantile is the single value (r1 = r2 = 1, frac = 0)
    assert(pct(Seq(42), Seq(0.0, 0.5, 1.0)) ==
      Map(0.0 -> 42.0, 0.5 -> 42.0, 1.0 -> 42.0))
    // exact midpoint between two values: 0 .. 100 at q=0.5 → 50
    assert(pct(Seq(0, 100), Seq(0.5)) == Map(0.5 -> 50.0))
    // type-7 on 1..4: h = q·3 → q=0.25 ⇒ 1.75, q=0.5 ⇒ 2.5
    assert(pct(Seq(1, 2, 3, 4), Seq(0.25, 0.5)) ==
      Map(0.25 -> 1.75, 0.5 -> 2.5))
    // ties collapse into one distinct-value row but keep their mass:
    // 1,1,1,9 → h(0.5) = 1.5 sits inside the run of 1s → exactly 1
    assert(pct(Seq(1, 1, 1, 9), Seq(0.5)) == Map(0.5 -> 1.0))
    // q=1.0 returns the max with no out-of-range r2 (least(n) clamp)
    assert(pct(Seq(3, 1, 7), Seq(1.0)) == Map(1.0 -> 7.0))
  }

  test("interpolatedPercentiles: NULL values excluded; NULL group keys survive") {
    // quantile_cont semantics: NULLs are not part of the quantile space —
    // [1, 2, NULL] at q=0.5 is 1.5, not the rank-shifted 1.0
    val withNull = Seq(Some(1), Some(2), None).toDF("v")
    val r = Relational.interpolatedPercentiles(withNull, col("v"), Seq(0.5))
      .as[(Double, Double)].collect().toMap
    assert(r == Map(0.5 -> 1.5))
    // a NULL group key is a stratum like any other (null-safe join keys)
    val grouped = Seq((Some("a"), 1), (Some("a"), 3), (None, 10), (None, 20))
      .toDF("g", "v")
    val byG = Relational.interpolatedPercentilesBy(grouped, Seq("g"),
        col("v"), Seq(0.5))
      .collect().map(row => Option(row.getString(0)) -> row.getDouble(2)).toMap
    assert(byG == Map(Some("a") -> 2.0, None -> 15.0))
  }
}
