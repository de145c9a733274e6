package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {

  import spark.implicits._

  private val df = Seq(
    (1L, Some(10.0), "a"), (2L, None, "b"), (3L, Some(-5.0), "c"),
    (3L, Some(99.0), "d"), (4L, None, "e")
  ).toDF("k", "v", "s")

  test("rowChecks evaluates every rule in one scan with per-rule fail counts") {
    val got = Quality.rowChecks(df, Seq(
        "v_null" -> col("v").isNull,
        "v_negative" -> (col("v") < 0.0),
        "never" -> lit(false)))
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == Map("v_null" -> ((2L, 5L)), "v_negative" -> ((1L, 5L)),
      "never" -> ((0L, 5L))))
  }

  test("uniqueness counts rows beyond the first per key") {
    val got = Quality.uniqueness(df, "k_unique", Seq("k"))
      .as[(String, Long, Long)].collect().head
    assert(got == (("k_unique", 1L, 5L))) // key 3 appears twice
  }

  test("orphans counts child keys missing from the parent") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Quality.orphans(df, parent, "k_orphans", Seq("k"), Seq("pk"))
      .as[(String, Long, Long)].collect().head
    assert(got == (("k_orphans", 1L, 5L))) // key 4 has no parent
  }

  test("psiDrift: zero for identical distributions, nonnegative terms, smoothed empties") {
    val ref = Seq(0, 0, 1, 1, 2, 5).toDF("v")
    // identical batch → every smoothed share pair is equal → terms exactly 0
    val same = Quality.psiDrift(ref, ref, col("v"), nBuckets = 6)
      .as[(Long, Long, Long, Double)].collect()
    assert(same.nonEmpty && same.forall(_._4 == 0.0))
    // shifted batch: bucket 5 empty in cur, bucket 3 empty in ref —
    // smoothing keeps both finite; every PSI term is >= 0 by construction
    val cur = Seq(0, 3, 3, 3).toDF("v")
    val drift = Quality.psiDrift(ref, cur, col("v"), nBuckets = 6)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(drift.values.forall(_._3 >= 0.0))
    assert(drift(3L)._1 == 0L && drift(3L)._2 == 3L && drift(3L)._3 > 0.0)
    assert(drift(5L)._1 == 1L && drift(5L)._2 == 0L && drift(5L)._3 > 0.0)
    // hand-check one term: bucket 3 with Laplace smoothing over 6 buckets
    val p3r = 1.0 / (6 + 6); val p3c = 4.0 / (4 + 6)
    assert(math.abs(drift(3L)._3 - (p3c - p3r) * math.log(p3c / p3r)) < 1e-6)
  }

  test("psiDriftFromCounts: stored histogram path equals the raw-rows path") {
    val ref = Seq(0, 0, 1, 1, 2, 5).toDF("v")
    val cur = Seq(0, 3, 3, 3).toDF("v")
    val raw = Quality.psiDrift(ref, cur, col("v"), 6)
      .collect().map(_.toSeq).toSet
    val stored = Quality.psiDriftFromCounts(
        Quality.histogram(ref, col("v")), cur, col("v"), 6)
      .collect().map(_.toSeq).toSet
    assert(raw == stored && raw.nonEmpty)
  }

  test("skewReport: heaviest keys first, exact counts and shares, k bound") {
    // key 1 x6, key 2 x3, key 3 x1 → total 10
    val df = (Seq.fill(6)(1) ++ Seq.fill(3)(2) ++ Seq(3)).toDF("k")
    val out = Quality.skewReport(df, Seq("k"), k = 2)
      .as[(Int, Long, Long)].collect().sortBy(-_._2)
    assert(out.length == 2)
    assert(out(0) == ((1, 6L, 6000L)))
    assert(out(1) == ((2, 3L, 3000L)))
  }

  test("ksDrift: exact sup-CDF gap, smallest argmax on ties, zero on " +
      "identical samples, partition-invariant") {
    // ref {1,2,3,4} vs cur {3,4,5,6}: |F1−F2| = .25,.5,.5,.5,.25,0 at
    // v=1..6 → D = 0.5 first attained at v=2 → 5000 bp, at_value 2
    val ref = Seq(1L, 2L, 3L, 4L).toDF("v")
    val cur = Seq(3L, 4L, 5L, 6L).toDF("v")
    def run(r: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      Quality.ksDrift(r, c, col("v"))
        .as[(Long, Long, Long, Long)].collect().head
    assert(run(ref, cur) == ((4L, 4L, 5000L, 2L)))
    assert(run(ref.repartition(3), cur.repartition(2)) ==
      ((4L, 4L, 5000L, 2L)))
    // identical samples → D = 0 at the smallest value
    assert(run(ref, ref) == ((4L, 4L, 0L, 1L)))
    // unequal sizes: ref {1,1,2} vs cur {2}: F1 = 2/3, 1; F2 = 0, 1 →
    // D = 2/3 at v=1 → 6666 bp
    assert(run(Seq(1L, 1L, 2L).toDF("v"), Seq(2L).toDF("v")) ==
      ((3L, 1L, 6666L, 1L)))
    // an empty side yields null ks_bp, not a divide-by-zero
    val e = Quality.ksDrift(ref.limit(0), cur, col("v"))
      .select(col("ks_bp")).collect().head
    assert(e.isNullAt(0))
  }

  test("rankSumU2: hand pair counts with ties, perfect and inverse " +
      "ranking, partition-invariant") {
    def run(p: Seq[Long], n: Seq[Long]) =
      Quality.rankSumU2(p.toDF("v"), n.toDF("v"), col("v"))
        .as[(Long, Long, Long, Long)].collect().head
    // pos {2,5} vs neg {2,3}: pairs (2,2)=½, (2,3)=0, (5,2)=1, (5,3)=1
    // → U = 2.5, u2 = 5, auc = 5/8 = 6250 bp
    assert(run(Seq(2L, 5L), Seq(2L, 3L)) == ((2L, 2L, 5L, 6250L)))
    // perfect separation → AUC 1.0; inverted → 0
    assert(run(Seq(3L, 5L), Seq(1L, 2L)) == ((2L, 2L, 8L, 10000L)))
    assert(run(Seq(1L, 2L), Seq(3L, 5L)) == ((2L, 2L, 0L, 0L)))
    // all-tied → AUC exactly ½
    assert(run(Seq(7L, 7L), Seq(7L)) == ((2L, 1L, 2L, 5000L)))
    // partition invariance on a larger mix
    val p = (1L to 100L).map(i => (i * 13) % 60)
    val n = (1L to 80L).map(i => (i * 7) % 50)
    val full = run(p, n)
    val viaRepart = Quality.rankSumU2(p.toDF("v").repartition(7),
        n.toDF("v").repartition(3), col("v"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(viaRepart == full)
    // empty side → null auc_bp
    assert(Quality.rankSumU2(spark.emptyDataset[Long].toDF("v"),
      n.toDF("v"), col("v")).select(col("auc_bp")).collect().head.isNullAt(0))
  }

  test("chiSquareE6: hand-computed table incl. an ABSENT cell, " +
      "independence gives zero, partition-invariant") {
    // counts: (x,u)=10 (x,v)=20 (y,u)=20 (y,v)=10 (z,u)=5, (z,v) ABSENT.
    // N=65, r=(30,30,5), c=(35,30). Per-cell ⌊(o·N−r·c)²·10⁶/(N·r·c)⌋:
    // 2344322 + 2735042 + 915750 + 1068376 + 1978021 + 2307692(the o=0
    // cell) = 11349203; dof = (3−1)(2−1) = 2.
    val rows = Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(20)(("y", "u")) ++ Seq.fill(10)(("y", "v")) ++
      Seq.fill(5)(("z", "u"))
    val df = rows.toDF("a", "b")
    def run(d: org.apache.spark.sql.DataFrame) =
      Quality.chiSquareE6(d, col("a"), col("b"))
        .as[(Long, Long, Long)].collect().head
    assert(run(df) == ((11349203L, 2L, 65L)))
    assert(run(df.repartition(7)) == ((11349203L, 2L, 65L)))
    // perfectly proportional table → every o·N == r·c → χ² = 0
    val indep = (Seq.fill(10)(("x", "u")) ++ Seq.fill(20)(("x", "v")) ++
      Seq.fill(5)(("y", "u")) ++ Seq.fill(10)(("y", "v"))).toDF("a", "b")
    assert(run(indep) == ((0L, 1L, 45L)))
  }

  test("ksDrift / rankSumU2: NULL values merge into ONE per-value row " +
      "(null-safe join), never a spurious CDF point") {
    // identical samples incl. nulls → D must be 0. Pre-r16 the plain
    // full_outer on Seq("v") never matched null keys, so ref-null and
    // cur-null survived as TWO v=NULL rows and the cumsum emitted a
    // spurious partial-CDF point (this read ks_bp=5000 here, not 0).
    val withNulls = Seq[java.lang.Long](null, null, 1L, 2L).toDF("v")
    val same = Quality.ksDrift(withNulls, withNulls, col("v"))
      .select(col("n_ref"), col("n_cur"), col("ks_bp"))
      .as[(Long, Long, Long)].collect().head
    assert(same == ((4L, 4L, 0L)))
    // NULL ranks as the smallest value (nulls-first ordering, bucket 0):
    // ref {null,null,2} vs cur {2} → D = 2/3 attained AT v=NULL
    val ks = Quality.ksDrift(Seq[java.lang.Long](null, null, 2L).toDF("v"),
      Seq[java.lang.Long](2L).toDF("v"), col("v")).collect().head
    assert(ks.getLong(2) == 6666L && ks.isNullAt(3))
    // rankSumU2: one shared NULL key → the exact ½-tie credit, not an
    // ordering-dependent u2. pos {null,3} vs neg {null,1}: (null,null)=½,
    // (null,1)=0, (3,null)=1, (3,1)=1 → U=2.5, u2=5, auc 6250 bp
    val u = Quality.rankSumU2(Seq[java.lang.Long](null, 3L).toDF("v"),
      Seq[java.lang.Long](null, 1L).toDF("v"), col("v"))
      .as[(Long, Long, Long, Long)].collect().head
    assert(u == ((2L, 2L, 5L, 6250L)))
  }

  test("ksDriftFromCounts: summed per-batch reference states equal the " +
      "full rebuild row-for-row") {
    val ref = Seq(1L, 1L, 2L, 3L, 5L, 5L).toDF("v")
    val cur = Seq(2L, 4L, 6L).toDF("v")
    val full = Quality.ksDrift(ref, cur, col("v")).collect().toSeq
    val merged = Seq(ref.filter(col("v") <= 2), ref.filter(col("v") > 2))
      .map(_.groupBy(col("v")).agg(count(lit(1)).as("c")))
      .reduce(_ unionByName _)
      .groupBy("v").agg(sum(col("c")).as("c"))
    assert(Quality.ksDriftFromCounts(merged, cur, col("v"))
      .collect().toSeq == full)
  }
}
