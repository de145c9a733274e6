package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The six table pipelines — reference parity for `etl/pipeline.py:123-235`,
  * each a pure `DataFrame => DataFrame` over the raw (already-unwrapped)
  * endpoint records.
  *
  * All row-at-a-time Python dict loops become whole-column expressions (one
  * narrow codegen stage per table — no shuffle anywhere in this layer), and
  * every reference edge case is preserved deliberately (SURVEY §7.4):
  *  - missing/null → defaults via `coalesce` ('' / 0 / false / 'Unknown');
  *  - description capped at 500 chars, null-safe (pipeline.py:155,173);
  *  - category strips the 'EEquippableCategory::' prefix but
  *    wall_penetration KEEPS its prefix (pipeline.py:185 vs :192);
  *  - `explode` (not `explode_outer`): null/empty child arrays yield zero
  *    child rows — the Melee weapon is absent from weapon_damage
  *    (pipeline.py:201, F3);
  *  - `size(null)` would be -1 in legacy Spark; coalesce to empty array
  *    keeps the reference's 0 (pipeline.py:216,221, P7).
  */
object Transforms {

  private def str(c: Column): Column = coalesce(c, lit(""))
  private def num(c: Column): Column = coalesce(c, lit(0L))
  private def dbl(c: Column): Column = coalesce(c, lit(0.0))
  private def trunc500(c: Column): Column = substring(coalesce(c, lit("")), 1, 500)

  /** agents — etl/pipeline.py:146-158. */
  def agents(raw: DataFrame): DataFrame =
    raw.filter(coalesce(col("isPlayableCharacter"), lit(false)))
      .select(
        str(col("uuid")).as("uuid"),
        str(col("displayName")).as("name"),
        coalesce(col("role.displayName"), lit("Unknown")).as("role"),
        trunc500(col("description")).as("description"),
        str(col("displayIcon")).as("icon_url"))

  /** abilities — etl/pipeline.py:160-175: playable agents only, one row per
    * ability, parent name/role denormalized onto each child (F1).
    */
  def abilities(raw: DataFrame): DataFrame =
    raw.filter(coalesce(col("isPlayableCharacter"), lit(false)))
      .select(
        str(col("displayName")).as("agent_name"),
        coalesce(col("role.displayName"), lit("Unknown")).as("agent_role"),
        explode(col("abilities")).as("ab"))
      .select(
        col("agent_name"), col("agent_role"),
        str(col("ab.slot")).as("slot"),
        str(col("ab.displayName")).as("ability_name"),
        trunc500(col("ab.description")).as("description"))

  /** weapons — etl/pipeline.py:177-195. */
  def weapons(raw: DataFrame): DataFrame =
    raw.select(
      str(col("uuid")).as("uuid"),
      str(col("displayName")).as("name"),
      regexp_replace(str(col("category")), "^EEquippableCategory::", "").as("category"),
      num(col("shopData.cost")).cast("long").as("cost"),
      dbl(col("weaponStats.fireRate")).as("fire_rate"),
      num(col("weaponStats.magazineSize")).cast("long").as("magazine_size"),
      dbl(col("weaponStats.reloadTimeSeconds")).as("reload_time"),
      dbl(col("weaponStats.equipTimeSeconds")).as("equip_time"),
      dbl(col("weaponStats.firstBulletAccuracy")).as("first_bullet_accuracy"),
      str(col("weaponStats.wallPenetration")).as("wall_penetration"), // prefix KEPT
      str(col("displayIcon")).as("icon_url"))

  /** weapon_damage — etl/pipeline.py:197-211: positional explode (F2);
    * weapons with null/empty damageRanges emit no rows (F3). Damage columns
    * pinned DOUBLE (the reference's REAL/INTEGER split is accidental
    * inference — SURVEY §1.3).
    */
  def weaponDamage(raw: DataFrame): DataFrame =
    raw.select(
        str(col("displayName")).as("weapon_name"),
        posexplode(col("weaponStats.damageRanges")))
      .select(
        col("weapon_name"),
        col("pos").cast("int").as("range_index"),
        num(col("col.rangeStartMeters").cast("long")).cast("int").as("range_start"),
        num(col("col.rangeEndMeters").cast("long")).cast("int").as("range_end"),
        dbl(col("col.headDamage")).as("head_damage"),
        dbl(col("col.bodyDamage")).as("body_damage"),
        dbl(col("col.legDamage")).as("leg_damage"))

  /** maps — etl/pipeline.py:213-224: coordinates stays nullable;
    * num_callouts counts a possibly-null array as 0, not -1/NULL (P7).
    */
  def maps(raw: DataFrame): DataFrame =
    raw.select(
      str(col("uuid")).as("uuid"),
      str(col("displayName")).as("name"),
      col("coordinates").as("coordinates"),
      size(coalesce(col("callouts"), array())).as("num_callouts"),
      str(col("splash")).as("splash_url"))

  /** gamemodes — etl/pipeline.py:226-235: duration stays nullable free text;
    * missing allowsMatchTimeouts → false.
    */
  def gamemodes(raw: DataFrame): DataFrame =
    raw.select(
      str(col("uuid")).as("uuid"),
      str(col("displayName")).as("name"),
      col("duration").as("duration"),
      coalesce(col("allowsMatchTimeouts"), lit(false)).as("allows_timeouts"))

  /** Endpoint → output tables dispatch. agents and weapons each fan out to
    * TWO tables from one fetch (pipeline.py:127-133) — callers should cache
    * the raw DataFrame across the fan-out (SURVEY §4). Endpoints with no
    * entry here (competitivetiers) are dropped — P9, pipeline.py:123-144.
    */
  val dispatch: Map[String, Map[String, DataFrame => DataFrame]] = Map(
    "agents" -> Map("agents" -> agents _, "abilities" -> abilities _),
    "weapons" -> Map("weapons" -> weapons _, "weapon_damage" -> weaponDamage _),
    "maps" -> Map("maps" -> maps _),
    "gamemodes" -> Map("gamemodes" -> gamemodes _))

  /** Transform every extracted endpoint into its output tables, silently
    * dropping unmapped endpoints (logged by the caller).
    */
  def transformAll(raw: Map[String, DataFrame]): Map[String, DataFrame] =
    raw.flatMap { case (endpoint, df) =>
      dispatch.get(endpoint) match {
        case Some(tables) =>
          val cached = if (tables.size > 1) df.cache() else df
          tables.map { case (name, fn) => name -> fn(cached) }
        case None => Map.empty[String, DataFrame]
      }
    }
}
