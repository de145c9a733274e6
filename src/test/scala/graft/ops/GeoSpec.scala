package graft.ops

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** ops/Geo — integer-µ° grid radius join. The catalog oracle proves the
  * end-to-end pair set against the quadratic definition; these pin the
  * metric and blocking edges by hand.
  */
class GeoSpec extends SparkSpec {

  import spark.implicits._

  private def pairs(df: DataFrame, r: Long,
                    maxLat: Int = 60): Set[(Long, Long, Long)] =
    Geo.cellRadiusJoin(df, r, maxLat)
      .as[(Long, Long, Long)].collect().toSet

  test("cellRadiusJoin: exact µ°² metric, equator vs high-latitude lon " +
      "shrink, boundary pairs found exactly once") {
    val pts = Seq(
      (1L, 0L, 0L), // origin
      (2L, 50000L, 0L), // 0.05° north of 1 → d2 = 2.5e9, in
      (3L, 0L, 150000L), // 0.15° east of 1 → out (2.25e10); 0.051° of 4 → in
      (4L, 0L, 99000L), // 0.099° east of 1 → in; 12.3e9 from 2 → out
      // high latitude: Δlon 0.18° at ~59.5° — cos band 59 (5150 bp)
      // shrinks it to 92 700 µ° → IN, though the raw Δlon far exceeds r
      (5L, 59500000L, 0L),
      (6L, 59500000L, 180000L))
      .toDF("id", "lat_micro", "lon_micro")
    val got = pairs(pts, 100000L)
    val want = Set(
      (1L, 2L, 2500000000L),
      (1L, 4L, 99000L * 99000L),
      (3L, 4L, 51000L * 51000L),
      (5L, 6L, {
        val lt = 180000L * Geo.CosBp(59) / 10000L
        lt * lt
      }))
    assert(got == want, s"got $got")
    // every pair appears exactly once (the one-stamp-meets-home argument)
    val rows = Geo.cellRadiusJoin(pts, 100000L).collect()
    assert(rows.length == rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length)
  }

  test("cellRadiusJoin: blocking is lossless across cell boundaries and " +
      "under any partitioning") {
    // points straddling lat/lon cell boundaries at distance just under r
    val pts = Seq(
      (1L, 99999L, 0L), (2L, 100001L, 0L), // lat cells 0 vs 1, d = 2 µ°
      (3L, 0L, 199999L), (4L, 0L, 200001L), // lon cells straddle, d = 2 µ°
      (5L, -99999L, -199999L), (6L, -100001L, -200001L)) // negative side
      .toDF("id", "lat_micro", "lon_micro")
    val got = pairs(pts, 100000L)
    assert(got.map(p => (p._1, p._2)) == Set((1L, 2L), (3L, 4L), (5L, 6L)))
    val one = pairs(pts.repartition(1), 100000L)
    val many = pairs(pts.repartition(7), 100000L)
    assert(one == many && one == got)
  }

  test("cellRadiusJoin: lon cell sized for the truncating metric's max " +
      "qualifying Δlon (the rMicro·10⁴ div cosBp cell silently drops it)") {
    // At lat 60° (cosBp 5000), Δlon = 200001 truncates to lonTerm =
    // (200001·5000) div 10⁴ = 100000 = rMicro exactly — a qualifying pair
    // whose |Δlon| EXCEEDS the naive cell rMicro·10⁴/cosBp = 200000. The
    // corrected cell ((rMicro+1)·10⁴−1)/cosBp = 200001 keeps it adjacent.
    val r = 100000L
    val pts = Seq(
      (1L, 60000000L, 199999L), (2L, 60000000L, 400000L), // Δlon = 200001
      // one past the metric's reach: Δlon = 200002 → lonTerm = 100001 → out
      (3L, 60000000L, 1199999L), (4L, 60000000L, 1400001L))
      .toDF("id", "lat_micro", "lon_micro")
    val got = pairs(pts, r)
    assert(got == Set((1L, 2L, r * r)), s"got $got")
    // and one past the new cell boundary on the lat axis for symmetry:
    // qualifying |Δlat| is exactly rMicro (metric is exact there)
    val lat = Seq((1L, 0L, 0L), (2L, r, 0L), (3L, 5000000L, 0L),
      (4L, 5000000L + r + 1L, 0L)).toDF("id", "lat_micro", "lon_micro")
    assert(pairs(lat, r).map(p => (p._1, p._2)) == Set((1L, 2L)))
  }

  test("cellRadiusJoin: a point past the declared latitude bound raises " +
      "instead of silently losing pairs") {
    val pts = Seq((1L, 61000000L, 0L), (2L, 60900000L, 0L))
      .toDF("id", "lat_micro", "lon_micro")
    val e = intercept[Exception] {
      Geo.cellRadiusJoin(pts, 100000L, maxAbsLatDeg = 60).collect()
    }
    assert(e.getMessage != null)
    // widening the declared bound makes the same pair legal
    assert(pairs(pts, 100000L, maxLat = 62).map(p => (p._1, p._2)) ==
      Set((1L, 2L)))
  }
}
