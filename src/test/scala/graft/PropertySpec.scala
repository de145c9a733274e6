package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.etl.{Schemas, Transforms}
import graft.ops.Dedup

/** Property-based invariants (SURVEY §5): transforms tolerate arbitrary
  * null/missing shapes without throwing, and the accelerated operators are
  * equivalent to their naive definitions on random inputs.
  *
  * Uses ScalaCheck generators with a small deterministic sampler (each case
  * runs Spark jobs, so we keep case counts low and seeds fixed instead of
  * pulling in the scalatest-plus bridge).
  */
class PropertySpec extends SparkSpec {

  private def forAll[T](gen: Gen[T], cases: Int = 8)(body: T => Unit): Unit =
    (0 until cases).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val genStr = Gen.option(Gen.alphaNumStr.map(_.take(30)))
  private val genAbility: Gen[Row] = for {
    slot <- genStr; name <- genStr; desc <- genStr
  } yield Row(slot.orNull, name.orNull, desc.orNull)

  private val genAgent: Gen[Row] = for {
    uuid <- genStr; name <- genStr
    desc <- Gen.option(Gen.listOfN(600, Gen.alphaChar).map(_.mkString))
    icon <- genStr
    playable <- Gen.option(Gen.oneOf(true, false))
    role <- Gen.option(genStr.map(r => Row(r.orNull)))
    abilities <- Gen.option(Gen.listOf(genAbility).map(_.take(5)))
  } yield Row(uuid.orNull, name.orNull, desc.orNull, icon.orNull,
    playable.map(Boolean.box).orNull, role.orNull, abilities.orNull)

  test("agents/abilities transforms never throw and hold invariants on arbitrary null shapes") {
    forAll(Gen.listOf(genAgent).map(_.take(12))) { rows =>
      val raw = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), Schemas.Agent)
      val agents = Transforms.agents(raw).collect()
      val abilities = Transforms.abilities(raw).collect()
      val playable = rows.count(r => r.get(4) == java.lang.Boolean.TRUE)
      assert(agents.length == playable)
      assert(agents.forall(_.getAs[String]("description").length <= 500))
      assert(agents.forall(!_.isNullAt(0))) // null-default fills applied
      val expectedAbilities = rows.filter(_.get(4) == java.lang.Boolean.TRUE)
        .map(r => Option(r.get(6)).map(_.asInstanceOf[Seq[_]].size).getOrElse(0)).sum
      assert(abilities.length == expectedAbilities)
    }
  }

  private val genWeapon: Gen[Row] = for {
    uuid <- genStr; name <- genStr; cat <- genStr; icon <- genStr
    cost <- Gen.option(Gen.choose(0L, 9000L))
    nRanges <- Gen.choose(0, 4)
    stats <- Gen.option(Gen.listOfN(nRanges, Gen.choose(0.0, 200.0)).map { ds =>
      Row(9.0, 25L, 2.5, 1.0, 0.25, "EWallPenetrationDisplayType::Medium",
        ds.map(d => Row(0.0, 30.0, d, d, d)))
    })
    shop <- Gen.option(cost.map(c => Row(c)).getOrElse(Row(null)))
  } yield Row(uuid.orNull, name.orNull, cat.orNull, icon.orNull,
    shop.orNull, stats.orNull)

  test("weapon transforms: damage rows = Σ ranges over weapons with stats; no throw") {
    forAll(Gen.listOf(genWeapon).map(_.take(10))) { rows =>
      val raw = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), Schemas.Weapon)
      val weapons = Transforms.weapons(raw).collect()
      val damage = Transforms.weaponDamage(raw).collect()
      assert(weapons.length == rows.size)
      val expected = rows.map(r => Option(r.get(5))
        .map(_.asInstanceOf[Row].getSeq[Row](6).size).getOrElse(0)).sum
      assert(damage.length == expected)
      assert(damage.forall(_.getAs[Int]("range_index") >= 0))
    }
  }

  test("native DotProduct is bit-identical to the HOF fold it replaced (null-free arrays)") {
    import spark.implicits._
    val genVec = Gen.listOfN(16, Gen.chooseNum(-10f, 10f))
    forAll(Gen.listOfN(20, Gen.zip(genVec, genVec))) { pairs =>
      whenever(pairs.nonEmpty) {
        val df = pairs.map { case (a, b) => (a.toArray, b.toArray) }
          .toDF("a", "b")
        val both = df.select(
          graft.functions.ArrayMath.dotNative(col("a"), col("b")).as("native"),
          aggregate(zip_with(col("a").cast("array<double>"),
            col("b").cast("array<double>"), _ * _), lit(0.0), _ + _).as("hof"))
          .collect()
        both.foreach { r =>
          assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
            java.lang.Double.doubleToLongBits(r.getDouble(1)))
        }
      }
    }
  }

  test("DotProduct null ELEMENT skips as zero — intentionally diverging from the HOF's NULL") {
    val df = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE), 3.0D) AS a, " +
        "array(2.0D, 5.0D, 4.0D) AS b")
    val r = df.select(
      graft.functions.ArrayMath.dotNative(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _).as("hof"),
      graft.functions.ArrayMath.dotNative(
        lit(null).cast("array<double>"), col("b")).as("nullarr"))
      .collect().head
    assert(r.getDouble(0) == 14.0) // 1*2 + 3*4 — the null slot contributes 0
    assert(r.isNullAt(1)) // the HOF fold nulls the entire product instead
    assert(r.isNullAt(2)) // a null ARRAY (vs element) is still null overall
  }

  test("native ShingleSet equals the HOF composition it replaced") {
    import spark.implicits._
    val genDoc = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e"))
      .map(_.take(12).mkString(" "))
    forAll(Gen.listOfN(15, genDoc)) { docs =>
      whenever(docs.nonEmpty) {
        val df = docs.toDF("text")
        val toks = split(col("text"), " ")
        val hof = when(size(toks) < 3, array().cast("array<string>"))
          .otherwise(array_sort(array_distinct(
            transform(sequence(lit(1), size(toks) - 2),
              i => concat_ws(" ", slice(toks, i, lit(3)))))))
        val rows = df.select(
          graft.functions.ShingleSet(toks, 3).as("native"), hof.as("hof"))
          .collect()
        rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
      }
    }
  }

  test("interpolatedPercentiles equals the sorted-array type-7 definition on random data") {
    import spark.implicits._
    val genCase = for {
      vals <- Gen.nonEmptyListOf(Gen.choose(-1000, 1000))
      qs <- Gen.nonEmptyListOf(Gen.choose(0, 100).map(_ / 100.0)).map(_.distinct)
    } yield (vals.take(60), qs.take(4))
    forAll(genCase) { case (vals, qs) =>
      val fast = graft.ops.Relational.interpolatedPercentiles(
          vals.toDF("v"), col("v"), qs)
        .as[(Double, Double)].collect().toMap
      val sorted = vals.sorted.toIndexedSeq
      val slow = qs.map { q =>
        val h = q * (sorted.size - 1)
        val lo = sorted(math.floor(h).toInt)
        val hi = sorted(math.min(math.floor(h).toInt + 1, sorted.size - 1))
        q -> BigDecimal(lo.toDouble + (hi - lo).toDouble * (h - math.floor(h)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
      assert(fast == slow)
    }
  }

  test("native ShingleDigests equals sorted xxhash64 of the ShingleSet strings") {
    import spark.implicits._
    val genDoc = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e", "é"))
      .map(_.take(12).mkString(" "))
    forAll(Gen.listOfN(15, genDoc)) { docs =>
      whenever(docs.nonEmpty) {
        val df = docs.toDF("text")
        val toks = split(col("text"), " ")
        // xxhash64() is Spark's seed-42 XXH64 — the same digest the native
        // expression computes per shingle; sorting the hashed string set
        // must reproduce the native output exactly (both signed ascending).
        val viaStrings = array_sort(
          transform(graft.functions.ShingleSet(toks, 3), s => xxhash64(s)))
        val rows = df.select(
          graft.functions.ShingleDigests(toks, 3).as("native"),
          viaStrings.as("hof")).collect()
        rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
      }
    }
  }

  test("native SimHashBits equals the HOF composition it replaced") {
    import spark.implicits._
    val genDoc = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "dd", "e", "é", "longtokenvalue"))
      .map(_.take(40))
    forAll(Gen.listOfN(12, genDoc)) { tokenLists =>
      whenever(tokenLists.nonEmpty) {
        val df = tokenLists.toDF("toks")
        // the exact interpreted chain the native expression replaced
        val hashes = transform(col("toks"), t => md5(t.cast("binary")))
        val hof = array_join(
          transform(sequence(lit(1), lit(32)), i =>
            when(aggregate(hashes, lit(0L),
              (acc, h) => acc + when(h.substr(i, lit(1)) >= "8", 1L).otherwise(-1L)) > 0,
              lit("1")).otherwise(lit("0"))), "")
        val rows = df.select(
          graft.functions.SimHashBits(col("toks")).as("native"), hof.as("hof"))
          .collect()
        rows.foreach { r =>
          assert(r.getString(0).length == 32)
          assert(r.getString(0) == r.getString(1))
        }
      }
    }
    // null ARRAY nulls the fingerprint in both definitions
    val nullRow = spark.sql("SELECT CAST(NULL AS ARRAY<STRING>) AS toks")
      .select(graft.functions.SimHashBits(col("toks"))).head()
    assert(nullRow.isNullAt(0))
  }

  test("prefix-filtered containmentPairs equals the brute-force quadratic definition") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val genDoc = for {
      drop <- Gen.choose(0, 6)
      take <- Gen.choose(4, 13)
      extra <- Gen.listOf(Gen.oneOf("alpha", "beta", "gamma")).map(_.take(2))
    } yield (base.split(" ").drop(drop).take(take) ++ extra).mkString(" ")
    forAll(Gen.listOfN(20, genDoc)) { texts =>
      whenever(texts.nonEmpty) {
        val docs = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, "en", t) }
          .toDF("doc_id", "lang", "text")
        val fast = Dedup.containmentPairs(docs, 3, 0.8)
          .select("src", "dst").as[(Long, Long)].collect().toSet
        def sh(t: String): Set[String] =
          t.split(" ").toSeq.sliding(3).filter(_.size == 3)
            .map(_.mkString(" ")).toSet
        val shs = texts.zipWithIndex.map { case (t, i) => (i.toLong, sh(t)) }
        val slow = (for {
          (ia, sa) <- shs; (ib, sb) <- shs
          if ia != ib && sa.nonEmpty
          if (sa & sb).size.toDouble / sa.size >= 0.8
        } yield (ia, ib)).toSet
        assert(fast == slow)
      }
    }
  }

  test("prefix-filtered ngramJaccardPairs equals the brute-force quadratic definition") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    // corpus with deliberate near-dups: small random edits of a base doc
    val genDoc = for {
      drop <- Gen.choose(0, 3)
      extra <- Gen.listOf(Gen.oneOf("alpha", "beta", "gamma")).map(_.take(3))
    } yield (base.split(" ").drop(drop) ++ extra).mkString(" ")
    forAll(Gen.listOfN(25, genDoc)) { texts =>
      whenever(texts.nonEmpty) {
        val docs = texts.zipWithIndex
          .map { case (t, i) => (i.toLong, "en", t) }
          .toDF("doc_id", "lang", "text")
        val fast = Dedup.ngramJaccardPairs(docs, 3, 0.6)
          .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
        // brute force in plain Scala over the same shingle definition
        def sh(t: String): Set[String] =
          t.split(" ").toSeq.sliding(3).filter(_.size == 3)
            .map(_.mkString(" ")).toSet
        val shs = texts.zipWithIndex.map { case (t, i) => (i.toLong, sh(t)) }
        val slow = (for {
          (ia, sa) <- shs; (ib, sb) <- shs if ia < ib
          inter = (sa & sb).size; uni = (sa | sb).size
          if uni > 0 && inter.toDouble / uni >= 0.6
        } yield (ia, ib)).toSet
        assert(fast == slow)
      }
    }
  }

  test("scd2Merge equals the full recompute on random append-only logs") {
    import spark.implicits._
    import graft.ops.History
    val genCase = for {
      n <- Gen.choose(6, 36)
      rows <- Gen.listOfN(n, for {
        k <- Gen.oneOf("k1", "k2", "k3", "k4")
        ts <- Gen.choose(0L, 50L)
        a <- Gen.oneOf("A", "B", "C")
      } yield (k, ts, a))
      cut <- Gen.choose(1L, 50L)
    } yield (rows.zipWithIndex.map { case ((k, ts, a), i) =>
      (k, ts, i.toLong, a) }, cut)  // tb = index → unique total order
    def hist(rows: Seq[(String, Long, Long, String)]) =
      History.scd2FromEvents(rows.toDF("k", "ts", "tb", "a"),
        Seq("k"), col("ts"), col("tb"), col("a"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("k"), col("attr_val"), col("valid_from"), col("valid_to"))
        .as[(String, String, Long, Option[Long])].collect().sorted.toSeq
    forAll(genCase, cases = 6) { case (log, cut) =>
      // ts-cutoff split satisfies the append-only-per-key precondition
      val pre = log.filter(_._2 < cut)
      val post = log.filter(_._2 >= cut)
      whenever(pre.nonEmpty && post.nonEmpty) {
        val merged = History.scd2Merge(hist(pre),
          post.toDF("k", "ts", "tb", "a"),
          Seq("k"), col("ts"), col("tb"), col("a"))
        assert(canon(merged) == canon(hist(log)))
      }
    }
  }

  test("IncrAgg merge equals the direct aggregate on random batch splits") {
    import spark.implicits._
    import graft.ops.IncrAgg
    val genCase = for {
      n <- Gen.choose(4, 40)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("x", "y", "z")
        v <- Gen.choose(-100L, 100L)
        u <- Gen.choose(0L, 15L)
      } yield (g, v, u))
      nb <- Gen.choose(2, 4)
    } yield (rows, nb)
    forAll(genCase, cases = 6) { case (rows, nb) =>
      val batches = rows.zipWithIndex.groupBy(_._2 % nb).values
        .map(_.map(_._1)).toSeq.filter(_.nonEmpty)
      val state = batches.map(b => IncrAgg.partialState(
        b.toDF("g", "v", "u"), Seq("g"), col("v"), col("u")))
        .reduce(_ unionByName _)
      val merged = IncrAgg.mergeState(state, Seq("g"))
        .as[(String, Long, Long, Long, Long, Long)].collect().sorted.toSeq
      val direct = rows.toDF("g", "v", "u").groupBy("g")
        .agg(count(lit(1)), sum("v"), min("v"), max("v"), countDistinct("u"))
        .as[(String, Long, Long, Long, Long, Long)].collect().sorted.toSeq
      // HLL is exact at these cardinalities (≤16 distinct per group)
      assert(merged == direct)
    }
  }

  test("snapshotDiff partitions keys correctly on random snapshots") {
    import spark.implicits._
    import graft.ops.Relational
    val genSnap = Gen.listOf(for {
      k <- Gen.choose(0L, 20L); v <- Gen.option(Gen.choose(-5L, 5L))
    } yield (k, v)).map(_.toMap.toSeq)
    forAll(Gen.zip(genSnap, genSnap), cases = 6) { case (o, n) =>
      whenever(o.nonEmpty || n.nonEmpty) {
        val got = Relational.snapshotDiff(
            o.toDF("k", "v"), n.toDF("k", "v"), Seq("k"), Seq("v"))
          .select(col("k"), col("change")).as[(Long, String)].collect().toMap
        val om = o.toMap; val nm = n.toMap
        val expect =
          (nm.keySet -- om.keySet).map(_ -> "insert") ++
          (om.keySet -- nm.keySet).map(_ -> "delete") ++
          (om.keySet & nm.keySet).filter(k => om(k) != nm(k)).map(_ -> "update")
        assert(got == expect.toMap)
      }
    }
  }
}
