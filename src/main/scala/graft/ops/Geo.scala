package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Geospatial primitives over EXACT integer micro-degree coordinates
  * (lat ∈ [−90e6, 90e6], lon ∈ [−180e6, 180e6]) — the grid-cell radius
  * join every location pipeline needs (co-visit mining, store catchment,
  * POI dedup), built so both engines compute identical bits:
  *
  *  - NO runtime trigonometry: the longitude-shrink factor comes from a
  *    shared 91-entry integer table `CosBp` (cos of each whole degree in
  *    basis points, computed once at build time) — a JVM `math.cos` vs
  *    DuckDB `cos` 1-ulp mismatch can never flip a boundary pair;
  *  - planar equirectangular metric in micro-degrees:
  *    `d² = dlat² + ((dlon · cosBp(band)) div 10⁴)²` with `band` = the
  *    pair's midpoint |latitude| degree — exact integer arithmetic, the
  *    right metric for city-scale radii (≤ ~1°; haversine corrections at
  *    that range are far below the µ° grid);
  *  - pigeonhole-lossless blocking: cells of `rMicro` µ° in latitude and
  *    `((rMicro+1)·10⁴ − 1) div cos(maxAbsLat)` in longitude (the max
  *    |Δlon| the truncating metric can admit, at the worst-case shrink
  *    over the corpus' latitude range), LEFT side stamped onto
  *    its 3×3 neighborhood, RIGHT side keyed home-cell only — every
  *    qualifying pair meets in exactly ONE (stamp, home) cell, so no
  *    distinct over the candidate fan-out (the BandedBits discipline,
  *    planar edition).
  */
object Geo {

  /** cos(d°) in basis points for d = 0..90 — THE shared constants both
    * engines index (Spark: array literal; oracle: list literal emitted
    * by `cosBpSqlList`).
    */
  val CosBp: Array[Long] =
    Array.tabulate(91)(d => math.round(math.cos(math.toRadians(d)) * 10000))

  /** The oracle-side literal of `CosBp` (1-based list indexing there). */
  def cosBpSqlList: String = CosBp.mkString("[", ", ", "]")

  /** All point pairs within `rMicro` micro-degrees (equirectangular,
    * id_a < id_b), with the exact integer `d2` (µ°²). `maxAbsLatDeg`
    * bounds the corpus latitude (validated row-by-row, not assumed —
    * a point past the bound silently breaks lossless blocking, so it
    * raises) and sizes the longitude cells; keep it tight — at 85° the
    * lon cells are 11× wider than at the equator and candidate buckets
    * grow accordingly. All cell/band/distance arithmetic is integer
    * `div` (truncating — cell boundaries land on multiples of the cell
    * size, so |Δ| ≤ cell ⇒ adjacent cells, the 3×3 coverage argument).
    */
  def cellRadiusJoin(points: DataFrame, rMicro: Long,
                     maxAbsLatDeg: Int = 60,
                     idCol: String = "id", latCol: String = "lat_micro",
                     lonCol: String = "lon_micro"): DataFrame = {
    require(rMicro >= 1, s"rMicro must be >= 1, got $rMicro")
    require(maxAbsLatDeg >= 0 && maxAbsLatDeg <= 89,
      s"maxAbsLatDeg must be in [0, 89], got $maxAbsLatDeg")
    // Size the lon cell from the TRUE max qualifying |Δlon| under the
    // truncating metric: |lonTerm| ≤ rMicro ⟺ |Δlon|·cosBp ≤ (rMicro+1)·10⁴−1,
    // so |Δlon| can reach ((rMicro+1)·10⁴−1) div cosBp — strictly more than
    // the naive rMicro·10⁴ div cosBp (truncation admits the extra ulp; e.g.
    // rMicro=100000, cosBp=5000: Δlon=200001 still lands d2 = rMicro²).
    // Worst case over the corpus is the smallest cosBp, i.e. maxAbsLatDeg.
    val lonCell = ((rMicro + 1) * 10000L - 1) / CosBp(maxAbsLatDeg)
    val latBound = maxAbsLatDeg.toLong * 1000000L
    val p = points.select(col(idCol).cast("long").as("id"),
      col(latCol).cast("long").as("lat"), col(lonCol).cast("long").as("lon"))
    val pg = p.withColumn("lat",
      when(abs(col("lat")) > latBound,
        raise_error(lit(s"cellRadiusJoin: |lat_micro| exceeds the declared " +
          s"maxAbsLatDeg=$maxAbsLatDeg bound — lossless blocking broken")))
        .otherwise(col("lat")))
    val home = pg.select(col("id"), col("lat"), col("lon"),
      expr(s"lat div $rMicro").as("cy"),
      expr(s"lon div $lonCell").as("cx"))
    val stamps = home.select(col("id").as("a_id"), col("lat").as("a_lat"),
        col("lon").as("a_lon"),
        explode(array((for { dy <- -1 to 1; dx <- -1 to 1 } yield
          struct((col("cy") + dy).as("cy"), (col("cx") + dx).as("cx"))): _*))
          .as("c"))
      .select(col("a_id"), col("a_lat"), col("a_lon"),
        col("c.cy").as("cy"), col("c.cx").as("cx"))
    val dLat = col("a_lat") - col("lat")
    val lonTerm = expr(
      s"((a_lon - lon) * element_at(${cosArrSql}, " +
        "cast((abs(a_lat + lat) div 2) div 1000000 as int) + 1)) div 10000")
    val d2 = dLat * dLat + lonTerm * lonTerm
    stamps.join(home, Seq("cy", "cx"))
      .filter(col("a_id") < col("id"))
      .select(col("a_id").as("id_a"), col("id").as("id_b"), d2.as("d2"))
      .filter(col("d2") <= lit(rMicro * rMicro))
  }

  /** The Spark-SQL literal of `CosBp` (used inside `expr` arithmetic so
    * every division stays integer `div`).
    */
  private def cosArrSql: String =
    CosBp.mkString("array(", "L, ", "L)")
}
