package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Curation operators: determinism and stability properties that matter at
  * scale — membership must be a pure function of the key, never of
  * partitioning, run order, or corpus size.
  */
class CurateSpec extends SparkSpec {

  import spark.implicits._

  private def ids(n: Int, parts: Int): DataFrame =
    (1L to n.toLong).toDF("doc_id").repartition(parts)

  test("hashSplit: total, partition-invariant, fractions near targets") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def assignments(parts: Int): Map[Long, String] =
      Curate.hashSplit(ids(1000, parts), col("doc_id"), splits)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
    val a1 = assignments(1)
    assert(a1.size == 1000) // every row assigned exactly once
    assert(assignments(13) == a1) // partitioning cannot move a row
    val counts = a1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 800) < 60)
    assert(math.abs(counts("val") - 100) < 40)
    assert(math.abs(counts("test") - 100) < 40)
  }

  test("hashSplit membership is stable when the corpus grows") {
    val splits = Seq("train" -> 0.9, "holdout" -> 0.1)
    val small = Curate.hashSplit(ids(300, 4), col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val large = Curate.hashSplit(ids(1000, 4), col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(small.forall { case (id, s) => large(id) == s })
  }

  test("hashSample: deterministic subset, stable under growth, near the rate") {
    val small = Curate.hashSample(ids(300, 3), col("doc_id"), 0.2)
      .as[Long].collect().toSet
    val large = Curate.hashSample(ids(1000, 7), col("doc_id"), 0.2)
      .as[Long].collect().toSet
    assert(small == large.filter(_ <= 300L)) // growth never reshuffles
    assert(math.abs(large.size - 200) < 60)
  }

  test("benchmarkOverlap flags only the planted near-copy") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // near-copy of bench
      (2L, "completely unrelated text about spark physical plans"),
      (3L, "alpha beta gamma something else entirely here now")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta iota")
    ).toDF("doc_id", "text")
    val out = Curate.benchmarkOverlap(docs, bench, n = 3, minShared = 3)
      .select("doc_id", "bench_id", "n_shared")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 100L, 5L))) // 5 shared 3-grams; doc 3 shares only 1
  }

  test("mixtureSample: per-stratum rates, default for unknown strata, consistent with hashSample") {
    val df = (1L to 1000L).map(i =>
      (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "xx"))
      .toDF("doc_id", "lang")
    val kept = Curate.mixtureSample(df, col("doc_id"), col("lang"),
        Map("en" -> 1.0, "de" -> 0.3), defaultRate = 0.0)
      .select("doc_id", "lang").as[(Long, String)].collect()
    val byLang = kept.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("en") == 333) // rate 1.0 keeps every en row (3,6,...,999)
    assert(!byLang.contains("xx")) // default 0.0 drops unknown strata
    assert(byLang("de") > 30 && byLang("de") < 130) // ≈ 0.3 of 333
    // per-stratum membership IS hashSample membership at that stratum's rate
    val deDirect = Curate.hashSample(df.filter(col("lang") === "de"),
      col("doc_id"), 0.3).as[(Long, String)].collect().map(_._1).toSet
    assert(kept.filter(_._2 == "de").map(_._1).toSet == deDirect)
  }

  test("stratifiedSampleN: exact quota per stratum, partition-invariant") {
    val df = (1L to 500L).map(i => (i, if (i % 10 == 0) "rare" else "common"))
      .toDF("doc_id", "lang")
    def pick(parts: Int): Map[String, Set[Long]] =
      Curate.stratifiedSampleN(df.repartition(parts), Seq(col("lang")),
          col("doc_id"), 15)
        .select("lang", "doc_id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val p1 = pick(1)
    assert(p1("common").size == 15 && p1("rare").size == 15)
    assert(pick(9) == p1)
    // a stratum smaller than the quota is kept whole
    val tiny = Curate.stratifiedSampleN(df.filter(col("doc_id") <= 25),
      Seq(col("lang")), col("doc_id"), 15)
    assert(tiny.filter(col("lang") === "rare").count() == 2) // ids 10, 20
  }

  test("quantizeInt8: dequantization error bounded by one step; zero vector safe") {
    val df = Seq(
      (1L, Array(0.5f, -1.25f, 0.0f, 1.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val rows = df.select(col("vec_id"), col("embedding"),
        Curate.quantizeInt8(col("embedding")).as("qz"))
      .select(col("vec_id"), col("embedding"), col("qz.scale"), col("qz.q"))
      .as[(Long, Array[Float], Float, Array[Int])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val (v1, s1, q1) = rows(1L)
    assert(s1 == 1.25f)
    assert(q1.forall(q => q >= -127 && q <= 127))
    v1.zip(q1).foreach { case (v, q) =>
      assert(math.abs(q * s1 / 127.0 - v) <= s1 / 127.0 + 1e-9)
    }
    val (_, s2, q2) = rows(2L)
    assert(s2 == 0.0f && q2.forall(_ == 0))
  }

  test("redactPii masks emails and long digit runs, leaves the rest") {
    val out = Seq("contact me at jane.doe+x@mail.example.org or call 5551234567 ext 42")
      .toDF("text").select(Curate.redactPii(col("text"))).as[String].head()
    assert(out == "contact me at <EMAIL> or call <NUM> ext 42")
  }

  test("winsorize clips at the exact nearest-rank bounds") {
    // 21 values 0,10,…,200: p05 bound = rank floor(.05·20)+1 = 2 → 10;
    // p95 bound = rank floor(.95·20)+1 = 20 → 190
    val df = (0 to 200 by 10).map(v => ("g", v.toLong)).toDF("grp", "c")
    val out = Curate.winsorize(df, Seq("grp"), col("c"), 0.05, 0.95)
      .select(col("v_cents"), col("v_clipped"), col("clip"))
      .as[(Long, Long, String)].collect().toSet
    assert(out.contains((0L, 10L, "lo")))
    assert(out.contains((200L, 190L, "hi")))
    assert(out.filter(r => r._1 >= 10 && r._1 <= 190)
      .forall(r => r._2 == r._1 && r._3 == "none"))
  }

  test("dsirScoreTopK against a stored LM equals the from-scratch dsirSelect") {
    val target = Seq(
      (100L, "distributed query engines shuffle data across partitions"),
      (101L, "query engines optimize shuffle and partition pruning"))
      .toDF("doc_id", "text")
    val pool = Seq(
      (1L, "distributed query engines shuffle data across partitions nightly"),
      (2L, "my cat sat on the warm windowsill all afternoon long"),
      (3L, "engines shuffle data across partitions when queries run"))
      .toDF("doc_id", "text")
    val direct = Curate.dsirSelect(pool, target, k = 3)
      .collect().map(_.toSeq).toSeq
    // store → read back → score: the steady-state path must reproduce the
    // from-scratch ranking exactly
    val dir = tmpDir("dsir-lm")
    Curate.dsirLm(pool, target).write.mode("overwrite").parquet(dir)
    val stored = Curate.dsirScoreTopK(pool, spark.read.parquet(dir), k = 3)
      .collect().map(_.toSeq).toSeq
    assert(stored == direct)
  }

  test("temperatureSample: α flattens the mixture toward low-resource strata") {
    val df = ((1 to 900).map(i => (i.toLong, "en")) ++
      (901 to 1000).map(i => (i.toLong, "sw"))).toDF("doc_id", "lang")
    def kept(alpha: Double): Map[String, Long] =
      Curate.temperatureSample(df, col("lang"), col("doc_id"), alpha, 300)
        .groupBy("lang").count().as[(String, Long)].collect().toMap
    val flat = kept(0.3)
    val prop = kept(1.0)
    // α=1 keeps languages proportional (~270/30); α=0.3 shifts budget
    // toward the low-resource language — its keep COUNT must rise and
    // the high-resource share must fall
    assert(flat.getOrElse("sw", 0L) > prop.getOrElse("sw", 0L))
    assert(flat("en") < prop("en"))
    // deterministic: same call → identical membership
    val again = Curate.temperatureSample(df, col("lang"), col("doc_id"), 0.3, 300)
      .select("doc_id").as[Long].collect().toSet
    val first = Curate.temperatureSample(df, col("lang"), col("doc_id"), 0.3, 300)
      .select("doc_id").as[Long].collect().toSet
    assert(again == first)
  }

  test("dsirSelect ranks target-like pool docs above dissimilar ones") {
    val target = Seq(
      (100L, "distributed query engines shuffle data across partitions"),
      (101L, "query engines optimize shuffle and partition pruning"))
      .toDF("doc_id", "text")
    val pool = Seq(
      (1L, "distributed query engines shuffle data across partitions nightly"),
      (2L, "my cat sat on the warm windowsill all afternoon long"),
      (3L, "engines shuffle data across partitions when queries run"))
      .toDF("doc_id", "text")
    val out = Curate.dsirSelect(pool, target, k = 3)
      .select("doc_id", "rank", "score")
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    assert(out.map(_._1).toSet == Set(1L, 2L, 3L))
    // both target-echoing docs outrank the unrelated one, which must
    // score strictly lower (its bigrams hit zero target-count buckets)
    assert(out.last._1 == 2L)
    assert(out.last._3 < out.head._3)
  }

  test("linearScore is the exact index-order double dot product plus bias") {
    val df = Seq((1L, Array(0.5f, -1.25f, 2.0f)), (2L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val w = Seq(0.25, 0.5, -0.125)
    val got = df.select(col("vec_id"),
        Curate.linearScore(col("embedding"), w, bias = 0.0625).as("s"))
      .as[(Long, Double)].collect().toMap
    val expect1 = ((0.5 * 0.25) + (-1.25 * 0.5)) + (2.0 * -0.125) + 0.0625
    assert(got(1L) == expect1)        // bit-exact, no tolerance
    assert(got(2L) == 0.0625)
  }

  test("shardAssign: deterministic, partition-invariant, dense in-shard positions") {
    val df = (1L to 400L).toDF("doc_id")
    val a = Curate.shardAssign(df, col("doc_id"), nShards = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    // partitioning must not change a single assignment or position
    val b = Curate.shardAssign(df.repartition(7), col("doc_id"), nShards = 8)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
    // shard ids in range; every shard's positions are exactly 1..count
    assert(a.forall(r => r._2 >= 0 && r._2 < 8))
    for ((_, rows) <- a.groupBy(_._2)) {
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
    // the hash spreads: no shard takes more than 3x its fair share
    assert(a.groupBy(_._2).values.map(_.size).max <= 150)
    // position order within a shard follows the unit hash (spot-check: the
    // doc with the smallest hash in shard 0 sits at pos 1)
    val u = df.select(col("doc_id"),
        Curate.unitHash(col("doc_id")).as("u"))
      .as[(Long, Double)].collect().toMap
    for ((shard, rows) <- a.groupBy(_._2)) {
      val byPos = rows.sortBy(_._3).map(_._1)
      assert(byPos.sameElements(rows.map(_._1).sortBy(id => (u(id), id))),
        s"shard $shard not ordered by unit hash")
    }
  }

  test("packSequences: offsets equal the sequential scan; boundaries, " +
      "straddles, and partitioning invariance") {
    // token counts 3,5,2,7,1 at L=4:
    //   d1 [0,3)  → seqs 0..0;  d2 [3,8)  → 0..1 (straddles);
    //   d3 [8,10) → 2..2;       d4 [10,17) → 2..4 (straddles two bounds);
    //   d5 [17,18) → 4..4
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c d e"), (3L, "a b"),
      (4L, "a b c d e f g"), (5L, "a")).toDF("doc_id", "text")
    val expected = Map(
      1L -> (3L, 0L, Some(0L), Some(0L), 1L),
      2L -> (5L, 3L, Some(0L), Some(1L), 2L),
      3L -> (2L, 8L, Some(2L), Some(2L), 1L),
      4L -> (7L, 10L, Some(2L), Some(4L), 3L),
      5L -> (1L, 17L, Some(4L), Some(4L), 1L))
    for (parts <- Seq(1, 7)) {
      val out = Curate.packSequences(docs.repartition(parts), seqLen = 4)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2),
            Option(r.get(3)).map(_.asInstanceOf[Long]),
            Option(r.get(4)).map(_.asInstanceOf[Long]),
            r.getLong(5)))).toMap
      assert(out == expected, s"parts=$parts")
    }
  }

  test("packManifest: per-doc contributions sum to its token count; " +
      "every sequence except the last holds exactly seqLen tokens") {
    val docs = (1L to 40L)
      .map(i => (i, Seq.fill((i % 7).toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val m = Curate.packManifest(docs, seqLen = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byDoc = m.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val tokCounts = (1L to 40L).map(i => i -> (i % 7 + 1)).toMap
    assert(byDoc == tokCounts)
    val bySeq = m.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (s, tot) =>
      if (s < lastSeq) assert(tot == 8L, s"seq $s holds $tot")
      else assert(tot >= 1L && tot <= 8L)
    }
    assert(m.forall(_._3 >= 1L), "no empty contributions")
  }

  test("stratifiedSample: exactly n per stratum, partition-invariant, " +
      "membership stable under append except at the boundary") {
    val docs = (1L to 300L).map(i => (i, s"lang${i % 3}"))
      .toDF("doc_id", "lang")
    def sample(df: DataFrame, parts: Int): Set[(String, Long, Long)] =
      Curate.stratifiedSample(df.repartition(parts),
          Seq(col("lang")), col("doc_id"), 10)
        .select("lang", "doc_id", "pos")
        .as[(String, Long, Long)].collect().toSet
    val s1 = sample(docs, 1)
    assert(s1.groupBy(_._1).forall(_._2.size == 10), "exactly 10 per lang")
    assert(sample(docs, 13) == s1, "partitioning moved a row")
    assert(s1.groupBy(_._1).forall { case (_, rows) =>
      rows.map(_._3).toSeq.sorted == (1L to 10L) }, "dense in-sample ranks")
    // appending new rows can only displace from the boundary inward:
    // surviving members keep their relative hash order
    val s2 = sample(docs.union(
      (301L to 400L).map(i => (i, s"lang${i % 3}")).toDF("doc_id", "lang")), 1)
    val survivors = s1.map(r => (r._1, r._2)) intersect s2.map(r => (r._1, r._2))
    assert(survivors.size >= 15, "appends should not evict most members")
  }

  test("weightedSample: hand-replayed ES keys, partition invariance, " +
      "n past the corpus keeps every row, weight dominance") {
    val rows = (1L to 200L).map(i => (i, 1L + (i % 7) * 10L))
    val df = rows.toDF("id", "w")
    def keys(d: DataFrame, n: Int): Seq[(Long, Long)] =
      Curate.weightedSample(d, col("id"), col("w"), n)
        .select(col("id"), col("es_key")).as[(Long, Long)].collect().toSeq
    // hand replay of the exact formula on the driver
    def handKey(id: Long, w: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md5.take(7), 16).toDouble / (1 << 28)
      val u6 = math.max(math.floor(u * 1e6 + 0.5) / 1e6, 1e-6)
      math.floor(-math.log(u6) * 1e9 / w).toLong
    }
    val expect = rows.map { case (i, w) => (i, handKey(i, w)) }
      .sortBy(t => (t._2, t._1)).take(20)
    assert(keys(df, 20) == expect)
    assert(keys(df.repartition(13), 20) == expect, "partitioning moved a row")
    // n >= corpus: every row survives (sampling degrades to a sort)
    assert(keys(df, 500).map(_._1).sorted == (1L to 200L))
    // a weight 10^6 times everyone else's makes its key ~10^6 smaller —
    // the heavy row must be drawn first
    val skew = (Seq((999L, 10000000L)) ++ (1L to 50L).map((_, 10L))).toDF("id", "w")
    assert(keys(skew, 1).head._1 == 999L)
    // non-positive weights raise instead of silently biasing the draw
    val bad = Seq((1L, 5L), (2L, 0L)).toDF("id", "w")
    val err = intercept[Exception](
      Curate.weightedSample(bad, col("id"), col("w"), 2).collect())
    assert(err.getMessage.contains("non-positive weight"))
  }

  test("weightedSample: merged per-batch top-n states ≡ the full-corpus " +
      "draw (the ES key is a pure row function)") {
    val df = (1L to 200L).map(i => (i, 1L + (i % 7) * 10L)).toDF("id", "w")
    def sel(d: DataFrame) =
      Curate.weightedSample(d, col("id"), col("w"), 30)
        .select(col("id"), col("es_key"))
    val full = sel(df).as[(Long, Long)].collect().toSeq
    val folded = (0 to 2).map(i => sel(df.filter(col("id") % 3 === i)))
      .reduce(_ unionByName _)
      .orderBy(col("es_key"), col("id")).limit(30)
      .as[(Long, Long)].collect().toSeq
    assert(folded == full)
  }

  test("laplaceNoisyCounts: hand-replayed inverse-CDF noise, noisy − true " +
      "≡ noise, scale halves as epsilon doubles, domain rejects") {
    val df = (1L to 300L).map(i => (s"g${i % 3}", i)).toDF("g", "id")
    def handNoise(key: String, eBp: Long): Long = {
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val u = java.lang.Long.parseLong(md5.take(7), 16).toDouble / (1 << 28)
      val u6 = math.min(math.max(
        math.floor(u * 1e6 + 0.5) / 1e6, 1e-6), 1.0 - 1e-6)
      (math.signum(u6 - 0.5) *
        math.floor(-math.log(1.0 - 2.0 * math.abs(u6 - 0.5)) *
          10000.0 / eBp)).toLong
    }
    def run(eBp: Long) =
      Curate.laplaceNoisyCounts(df, Seq("g"), eBp)
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> r).toMap
    val got = run(5000L)
    Seq("g0", "g1", "g2").foreach { g =>
      val (_, nTrue, noise, noisy) = got(g)
      assert(nTrue == 100L)
      assert(noise == handNoise(g, 5000L), s"noise replay diverged for $g")
      assert(noisy == nTrue + noise)
    }
    // doubling epsilon halves the scale: |noise| shrinks (floor-exact on
    // the same deviate), and the deviate itself is unchanged
    val tight = run(10000L)
    Seq("g0", "g1", "g2").foreach { g =>
      assert(tight(g)._3 == handNoise(g, 10000L))
      assert(math.abs(tight(g)._3) <= math.abs(got(g)._3))
    }
    intercept[IllegalArgumentException] {
      Curate.laplaceNoisyCounts(df, Seq("g"), 0L)
    }
  }
}
