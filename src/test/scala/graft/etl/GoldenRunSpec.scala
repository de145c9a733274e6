package graft.etl

import graft.SparkSpec

/** The golden end-to-end run SURVEY §5 promises: one `Pipeline.run()` over
  * full-scale fixture JSON files (via `Extract.FileTransport`, the exact
  * `--once --fixtures` path of `graft.etl.Main`) whose per-table row counts
  * reproduce the reference README's published table
  * (`/root/reference/README.md:58-66`: agents 28, abilities 117, weapons 20,
  * weapon_damage 37, maps 23, gamemodes 14 — 239 rows / 6 tables, the same
  * totals the reference's own `etl_runs` rows record), plus the `etl_runs`
  * metrics fields of `etl/pipeline.py:286-296`. The fixtures carry every
  * edge the reference tolerates: non-playable agents (filtered, with their
  * abilities), a null role, a >500-char description, a stats-less melee
  * weapon, an empty damageRanges array, a map without callouts, a
  * duration-less gamemode, and the unmapped competitivetiers endpoint.
  */
class GoldenRunSpec extends SparkSpec {

  private def writeFixture(dir: String, endpoint: String, body: String): Unit =
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, s"$endpoint.json"), body.getBytes("UTF-8"))

  /** 28 playable agents (5 with 5 abilities, 23 with 4 → 117 ability rows)
    * plus 2 non-playable ones whose abilities must NOT land.
    */
  private def agentsJson: String = {
    val playable = (0 until 28).map { i =>
      val role =
        if (i == 1) "null" // → 'Unknown'
        else s"""{"displayName":"${Seq("Initiator", "Sentinel", "Duelist", "Controller")(i % 4)}"}"""
      val desc =
        if (i == 2) "null"
        else if (i == 3) "\"" + ("d" * 600) + "\"" // truncated to 500
        else s""""Agent number $i""""
      val nAb = if (i < 5) 5 else 4
      val abilities = (0 until nAb).map { a =>
        val slot = Seq("Ability1", "Ability2", "Grenade", "Ultimate", "Passive")(a)
        val abDesc = if (a == 0 && i == 0) "null" else s""""Does thing $a""""
        s"""{"slot":"$slot","displayName":"Skill ${i}_$a","description":$abDesc}"""
      }.mkString("[", ",", "]")
      s"""{"uuid":"agent-$i","displayName":"Agent $i","description":$desc,
         |"displayIcon":"https://x/agents/$i.png","isPlayableCharacter":true,
         |"role":$role,"abilities":$abilities}""".stripMargin.replaceAll("\n", "")
    }
    val npc = (0 until 2).map { i =>
      s"""{"uuid":"npc-$i","displayName":"NPC $i","isPlayableCharacter":false,
         |"abilities":[{"slot":"Ability1","displayName":"Hidden"}]}"""
        .stripMargin.replaceAll("\n", "")
    }
    s"""{"status":200,"data":${(playable ++ npc).mkString("[", ",", "]")}}"""
  }

  /** 20 weapons; damageRanges: w0 null stats (melee), w1 empty array,
    * w2..w18 two ranges each (34), w19 three → 37 child rows.
    */
  private def weaponsJson: String = {
    val ws = (0 until 20).map { i =>
      val stats =
        if (i == 0) "null"
        else {
          val nR = if (i == 1) 0 else if (i == 19) 3 else 2
          val ranges = (0 until nR).map { r =>
            s"""{"rangeStartMeters":${r * 20},"rangeEndMeters":${(r + 1) * 20},
               |"headDamage":${140 - i}.0,"bodyDamage":${40 - i},
               |"legDamage":${34 - i}.5}""".stripMargin.replaceAll("\n", "")
          }.mkString("[", ",", "]")
          s"""{"fireRate":${5 + i}.75,"magazineSize":${10 + i},
             |"reloadTimeSeconds":2.5,"equipTimeSeconds":1.0,
             |"firstBulletAccuracy":0.25,
             |"wallPenetration":"EWallPenetrationDisplayType::Medium",
             |"damageRanges":$ranges}""".stripMargin.replaceAll("\n", "")
        }
      val shop = if (i == 0) "null" else s"""{"cost":${1000 + 100 * i}}"""
      s"""{"uuid":"weapon-$i","displayName":"Weapon $i",
         |"category":"EEquippableCategory::${if (i == 0) "Melee" else "Rifle"}",
         |"displayIcon":"https://x/weapons/$i.png",
         |"shopData":$shop,"weaponStats":$stats}"""
        .stripMargin.replaceAll("\n", "")
    }
    s"""{"status":200,"data":${ws.mkString("[", ",", "]")}}"""
  }

  private def mapsJson: String = {
    val ms = (0 until 23).map { i =>
      val coords = if (i == 0) "null" else s""""${i}N ${i}E""""
      val callouts =
        if (i == 1) "" // missing key → num_callouts 0, not -1/NULL
        else s""","callouts":${(0 until (i % 4)).map(c => s"""{"regionName":"R$c"}""").mkString("[", ",", "]")}"""
      s"""{"uuid":"map-$i","displayName":"Map $i","coordinates":$coords,
         |"splash":"https://x/maps/$i.png"$callouts}"""
        .stripMargin.replaceAll("\n", "")
    }
    s"""{"status":200,"data":${ms.mkString("[", ",", "]")}}"""
  }

  private def gamemodesJson: String = {
    val gs = (0 until 14).map { i =>
      val duration = if (i == 0) "null" else s""""${10 + i} min""""
      val timeouts = if (i == 1) "" else s""","allowsMatchTimeouts":${i % 2 == 0}"""
      s"""{"uuid":"mode-$i","displayName":"Mode $i","duration":$duration$timeouts}"""
    }
    s"""{"status":200,"data":${gs.mkString("[", ",", "]")}}"""
  }

  test("golden run: full fixtures reproduce the published README row counts + etl_runs fields") {
    val fixtures = tmpDir("golden_fixtures")
    writeFixture(fixtures, "agents", agentsJson)
    writeFixture(fixtures, "weapons", weaponsJson)
    writeFixture(fixtures, "maps", mapsJson)
    writeFixture(fixtures, "gamemodes", gamemodesJson)
    // unmapped endpoint — extracted, then dropped by the dispatch (P9)
    writeFixture(fixtures, "competitivetiers",
      """{"status":200,"data":[{"uuid":"tier-1","tierName":"Iron"}]}""")

    val wh = tmpDir("golden_wh")
    val cfg = PipelineConfig(warehouse = wh, requestDelayMs = 0)
    val clock = java.time.Instant.parse("2026-08-13T06:00:00Z")
    val result = new Pipeline(spark, cfg,
      new Extract.FileTransport(fixtures), () => clock).run()

    // the reference README's published counts, exactly
    val published = Map("agents" -> 28L, "abilities" -> 117L,
      "weapons" -> 20L, "weapon_damage" -> 37L, "maps" -> 23L,
      "gamemodes" -> 14L)
    assert(result.status == "Success")
    assert(result.rowsByTable == published)
    assert(result.totalRows == 239L)

    // every table really landed with that many rows (not just the metrics)
    published.foreach { case (table, n) =>
      assert(spark.read.parquet(s"$wh/$table").count() == n,
        s"table $table row count")
    }
    // the unmapped endpoint produced NO table; warehouse holds exactly 6+1
    val dirs = new java.io.File(wh).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == published.keySet + "etl_runs")

    // etl_runs metrics row — pipeline.py:286-296 fields
    val run = spark.read.parquet(s"$wh/etl_runs").collect()
    assert(run.length == 1)
    assert(run.head.getAs[String]("run_id") == "20260813_060000")
    assert(run.head.getAs[String]("status") == "Success")
    assert(run.head.getAs[Int]("tables_loaded") == 6)
    assert(run.head.getAs[Long]("total_rows") == 239L)
    assert(run.head.getAs[Double]("duration_seconds") >= 0.0)

    // edge semantics spot-checks on the loaded tables
    val agents = spark.read.parquet(s"$wh/agents")
    assert(agents.filter(org.apache.spark.sql.functions.col("role") === "Unknown").count() == 1)
    assert(agents.filter(org.apache.spark.sql.functions.col("uuid") === "agent-3")
      .head.getAs[String]("description").length == 500)
    // melee (null stats) and the empty-ranges weapon are absent from the child table
    val damaged = spark.read.parquet(s"$wh/weapon_damage")
      .select("weapon_name").distinct()
      .collect().map(_.getString(0)).toSet
    assert(!damaged.contains("Weapon 0") && !damaged.contains("Weapon 1"))
    // lineage columns carry the run id
    assert(agents.head.getAs[String]("_etl_run_id") == "20260813_060000")
  }
}
