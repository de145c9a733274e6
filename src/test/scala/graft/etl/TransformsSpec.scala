package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** P1-P9, F1-F3 — the six table pipelines, pinning the reference's exact
  * edge semantics (etl/pipeline.py:123-235; edge list from FIXTURES.md §A).
  */
class TransformsSpec extends SparkSpec {

  private def raw(endpoint: String, records: String): DataFrame =
    Extract.unwrapEnvelope(spark, endpoint,
      s"""{"status":200,"data":[$records]}""")

  private val longDesc = "x" * 600

  private val agentsJson =
    s"""{"uuid":"u1","displayName":"Gekko","description":"$longDesc",
        "displayIcon":"i1","isPlayableCharacter":true,
        "role":{"displayName":"Initiator"},
        "abilities":[
          {"slot":"Ability1","displayName":"Wingman","description":"EQUIP"},
          {"slot":"Grenade","displayName":"Mosh Pit","description":null}]},
       {"uuid":"u2","displayName":"NullRole","description":null,
        "displayIcon":null,"isPlayableCharacter":true,"role":null},
       {"uuid":"u3","displayName":"NPC","isPlayableCharacter":false,
        "abilities":[{"slot":"X","displayName":"Hidden"}]}""".replaceAll("\n\\s*", "")

  test("P1: non-playable agents filtered out of agents AND abilities") {
    val df = raw("agents", agentsJson)
    assert(Transforms.agents(df).count() == 2)
    val ab = Transforms.abilities(df).collect()
    assert(ab.length == 2) // only Gekko's; NPC's ability excluded
    assert(ab.forall(_.getString(0) == "Gekko"))
  }

  test("P4: null role → 'Unknown'; null description → ''; null icon → ''") {
    val rows = Transforms.agents(raw("agents", agentsJson))
      .filter("uuid = 'u2'").collect()
    assert(rows.head.getAs[String]("role") == "Unknown")
    assert(rows.head.getAs[String]("description") == "")
    assert(rows.head.getAs[String]("icon_url") == "")
  }

  test("P5: description capped at 500 chars") {
    val r = Transforms.agents(raw("agents", agentsJson))
      .filter("uuid = 'u1'").collect().head
    assert(r.getAs[String]("description").length == 500)
  }

  test("F1: abilities carry denormalized parent name/role; null child desc → ''") {
    val ab = Transforms.abilities(raw("agents", agentsJson))
      .filter("ability_name = 'Mosh Pit'").collect().head
    assert(ab.getAs[String]("agent_name") == "Gekko")
    assert(ab.getAs[String]("agent_role") == "Initiator")
    assert(ab.getAs[String]("description") == "")
  }

  private val weaponsJson =
    """{"uuid":"w1","displayName":"Vandal",
       "category":"EEquippableCategory::Rifle","displayIcon":"i",
       "shopData":{"cost":2900},
       "weaponStats":{"fireRate":9.75,"magazineSize":25,
         "reloadTimeSeconds":2.5,"equipTimeSeconds":1.0,
         "firstBulletAccuracy":0.25,
         "wallPenetration":"EWallPenetrationDisplayType::Medium",
         "damageRanges":[
           {"rangeStartMeters":0,"rangeEndMeters":30,"headDamage":160.0,
            "bodyDamage":40,"legDamage":34.0},
           {"rangeStartMeters":30,"rangeEndMeters":50,"headDamage":156.0,
            "bodyDamage":39,"legDamage":33.15}]}},
      {"uuid":"w2","displayName":"Melee",
       "category":"EEquippableCategory::Melee","displayIcon":null,
       "shopData":null,"weaponStats":null}""".replaceAll("\n\\s*", "")

  test("P6: category prefix stripped; wall_penetration prefix KEPT") {
    val w = Transforms.weapons(raw("weapons", weaponsJson))
      .filter("uuid = 'w1'").collect().head
    assert(w.getAs[String]("category") == "Rifle")
    assert(w.getAs[String]("wall_penetration") ==
      "EWallPenetrationDisplayType::Medium")
  }

  test("P4: null weaponStats/shopData → numeric defaults 0") {
    val m = Transforms.weapons(raw("weapons", weaponsJson))
      .filter("uuid = 'w2'").collect().head
    assert(m.getAs[Long]("cost") == 0L)
    assert(m.getAs[Double]("fire_rate") == 0.0)
    assert(m.getAs[Long]("magazine_size") == 0L)
    assert(m.getAs[String]("category") == "Melee")
  }

  test("F2: posexplode emits 0-based range_index in array order") {
    val dmg = Transforms.weaponDamage(raw("weapons", weaponsJson))
      .orderBy("range_index").collect()
    assert(dmg.map(_.getAs[Int]("range_index")).toSeq == Seq(0, 1))
    assert(dmg(0).getAs[Int]("range_end") == 30)
    assert(dmg(1).getAs[Double]("leg_damage") == 33.15)
  }

  test("F3: weapon with null damageRanges emits ZERO child rows (not null row)") {
    val dmg = Transforms.weaponDamage(raw("weapons", weaponsJson))
    assert(dmg.filter("weapon_name = 'Melee'").count() == 0)
  }

  private val mapsJson =
    """{"uuid":"m1","displayName":"Ascent","coordinates":"45N,12E",
       "splash":"s","callouts":[{"regionName":"A"},{"regionName":"B"}]},
      {"uuid":"m2","displayName":"Range","coordinates":null,"splash":null,
       "callouts":null}""".replaceAll("\n\\s*", "")

  test("P7: null callouts → num_callouts 0 (not -1/NULL); null coordinates stays NULL") {
    val ms = Transforms.maps(raw("maps", mapsJson)).orderBy("uuid").collect()
    assert(ms(0).getAs[Int]("num_callouts") == 2)
    assert(ms(1).getAs[Int]("num_callouts") == 0)
    assert(ms(1).isNullAt(ms(1).fieldIndex("coordinates")))
  }

  test("gamemodes: missing allowsMatchTimeouts → false; duration stays nullable") {
    val gm = Transforms.gamemodes(raw("gamemodes",
      """{"uuid":"g1","displayName":"Standard","duration":"~40m",
         "allowsMatchTimeouts":true},
        {"uuid":"g2","displayName":"TDM","duration":null}""".replaceAll("\n\\s*", "")))
      .orderBy("uuid").collect()
    assert(gm(0).getAs[Boolean]("allows_timeouts"))
    assert(!gm(1).getAs[Boolean]("allows_timeouts"))
    assert(gm(1).isNullAt(gm(1).fieldIndex("duration")))
  }

  test("P9: unmapped endpoints (competitivetiers) silently dropped by transformAll") {
    val out = Transforms.transformAll(Map(
      "agents" -> raw("agents", agentsJson),
      "competitivetiers" -> raw("competitivetiers", """{"x":1}""")))
    assert(out.keySet == Set("agents", "abilities"))
  }
}
