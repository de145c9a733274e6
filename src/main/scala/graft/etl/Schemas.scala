package graft.etl

import org.apache.spark.sql.types._

/** Declared schemas for the raw game-API JSON and the output tables.
  *
  * The reference never declares schemas — everything is inferred twice
  * (SURVEY §1.3), which is exactly what a production Spark path must not do:
  * `from_json`/`spark.read.schema(...)` with explicit StructTypes keeps
  * corrupt payloads from silently changing column types at 100 TB.
  * Output-table shapes follow FIXTURES.md §B (observed in the reference's
  * shipped SQLite DB, with the accidental REAL/INTEGER splits pinned to
  * DOUBLE deliberately).
  */
object Schemas {

  /** API envelope: `{"status": 200, "data": [...]}` —
    * reference unwrap at etl/pipeline.py:87-93. `data` is kept as an array
    * of endpoint-specific structs; pass the right element schema.
    */
  def envelope(element: StructType): StructType = StructType(Seq(
    StructField("status", LongType),
    StructField("data", ArrayType(element))))

  /** agents endpoint element — consumed by _transform_agents
    * (etl/pipeline.py:146-158) and _transform_abilities (:160-175).
    */
  val Agent: StructType = StructType(Seq(
    StructField("uuid", StringType),
    StructField("displayName", StringType),
    StructField("description", StringType),
    StructField("displayIcon", StringType),
    StructField("isPlayableCharacter", BooleanType),
    StructField("role", StructType(Seq(StructField("displayName", StringType)))),
    StructField("abilities", ArrayType(StructType(Seq(
      StructField("slot", StringType),
      StructField("displayName", StringType),
      StructField("description", StringType)))))))

  /** weapons endpoint element — _transform_weapons (etl/pipeline.py:177-195)
    * and _transform_damage_ranges (:197-211).
    */
  val Weapon: StructType = StructType(Seq(
    StructField("uuid", StringType),
    StructField("displayName", StringType),
    StructField("category", StringType),
    StructField("displayIcon", StringType),
    StructField("shopData", StructType(Seq(StructField("cost", LongType)))),
    StructField("weaponStats", StructType(Seq(
      StructField("fireRate", DoubleType),
      StructField("magazineSize", LongType),
      StructField("reloadTimeSeconds", DoubleType),
      StructField("equipTimeSeconds", DoubleType),
      StructField("firstBulletAccuracy", DoubleType),
      StructField("wallPenetration", StringType),
      StructField("damageRanges", ArrayType(StructType(Seq(
        StructField("rangeStartMeters", DoubleType),
        StructField("rangeEndMeters", DoubleType),
        StructField("headDamage", DoubleType),
        StructField("bodyDamage", DoubleType),
        StructField("legDamage", DoubleType))))))))))

  /** maps endpoint element — _transform_maps (etl/pipeline.py:213-224). */
  val GameMap: StructType = StructType(Seq(
    StructField("uuid", StringType),
    StructField("displayName", StringType),
    StructField("coordinates", StringType),
    StructField("splash", StringType),
    StructField("callouts", ArrayType(StructType(Seq(
      StructField("regionName", StringType)))))))

  /** gamemodes endpoint element — _transform_gamemodes (etl/pipeline.py:226-235). */
  val GameMode: StructType = StructType(Seq(
    StructField("uuid", StringType),
    StructField("displayName", StringType),
    StructField("duration", StringType),
    StructField("allowsMatchTimeouts", BooleanType)))

  /** Raw-element schema per configured endpoint; endpoints without an entry
    * (e.g. competitivetiers) are extracted but dropped at transform time —
    * the reference's P9 semantics (etl/pipeline.py:123-144 by omission).
    */
  val byEndpoint: Map[String, StructType] = Map(
    "agents" -> Agent, "weapons" -> Weapon, "maps" -> GameMap,
    "gamemodes" -> GameMode)

  /** etl_runs — the only schema the reference declares (etl/pipeline.py:
    * 257-267); kept as the run-metadata sink schema.
    */
  val EtlRuns: StructType = StructType(Seq(
    StructField("run_id", StringType, nullable = false),
    StructField("started_at", StringType),
    StructField("completed_at", StringType),
    StructField("status", StringType),
    StructField("tables_loaded", IntegerType),
    StructField("total_rows", LongType),
    StructField("duration_seconds", DoubleType)))
}
