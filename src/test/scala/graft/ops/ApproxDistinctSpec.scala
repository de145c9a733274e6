package graft.ops

import graft.SparkSpec
import graft.tables.Tables.load
import org.apache.spark.sql.functions._

/** Bounds the one catalog query with no SQL oracle by design:
  * `agg_approx_distinct` (HLL++ sketches differ across engines, so a DuckDB
  * hash compare is impossible). This spec pins the estimate to the EXACT
  * count instead: relative error within 3× the configured rsd (the rsd is
  * the sketch's standard deviation; for fixed data the estimate is
  * deterministic, so the measured error below is a stable regression bound,
  * not a flaky probabilistic one).
  */
class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct within 3x rsd of exact count, sf0.001 and sf0.01") {
    val rsd = 0.05 // approx_count_distinct's default, as the catalog query uses
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val rows = load(spark, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(approx_count_distinct(col("o_custkey")).as("approx"),
          countDistinct(col("o_custkey")).as("exact"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val approx = r.getAs[Long]("approx")
        val exact = r.getAs[Long]("exact")
        val relErr = math.abs(approx - exact).toDouble / exact
        info(f"$dir ${r.getAs[String]("o_orderstatus")}: " +
          f"approx=$approx exact=$exact relErr=$relErr%.4f")
        assert(relErr <= 3 * rsd,
          s"$dir ${r.get(0)}: approx=$approx exact=$exact relErr=$relErr > ${3 * rsd}")
      }
    }
  }
}
