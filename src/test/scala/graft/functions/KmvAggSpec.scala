package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvAggSpec extends SparkSpec {

  import spark.implicits._
  import KmvAgg.{Kmv, KmvMinAgg}

  test("KmvMinAgg: keeps the k smallest DISTINCT hashes, sorted; " +
      "above-threshold values rejected; duplicates never double-fill") {
    val agg = new KmvMinAgg(4)
    val b = Seq(50L, 10L, 30L, 30L, 70L, 20L, 40L, 10L)
      .foldLeft(agg.zero)(agg.reduce)
    assert(b.hashes == Seq(10L, 20L, 30L, 40L))
    // a new below-threshold value evicts the current max
    assert(agg.reduce(b, 5L).hashes == Seq(5L, 10L, 20L, 30L))
    // an above-threshold value leaves the sketch untouched
    assert(agg.reduce(b, 99L).hashes == Seq(10L, 20L, 30L, 40L))
  }

  test("KmvMinAgg.merge: sorted-run merge dedupes and caps at k — " +
      "commutative and idempotent") {
    val agg = new KmvMinAgg(3)
    val a = Kmv(Vector(1L, 5L, 9L))
    val b = Kmv(Vector(2L, 5L, 8L))
    assert(agg.merge(a, b).hashes == Seq(1L, 2L, 5L))
    assert(agg.merge(b, a).hashes == Seq(1L, 2L, 5L))
    assert(agg.merge(a, a).hashes == a.hashes)
    assert(agg.merge(a, agg.zero).hashes == a.hashes)
  }

  test("kmv sketch is partition-invariant; n < k degrades to the exact " +
      "distinct set") {
    val df = (0L until 400L).map(i => ((i * 37) % 90).toString).toDF("v")
      .select(conv(substring(md5(col("v")), 1, 15), 16, 10)
        .cast("long").as("h"))
    def sk(d: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] =
      d.agg(KmvAgg.kmvMin(col("h"), k).as("s"))
        .select(col("s.hashes")).as[Seq[Long]].head()
    // 90 distinct values, k = 128 > n: the sketch IS the distinct set
    val all = sk(df, 128)
    assert(all.length == 90 && all == all.sorted && all.distinct == all)
    // k = 16: exactly the 16 smallest of that set, however partitioned
    val want16 = all.take(16)
    assert(sk(df, 16) == want16)
    assert(sk(df.repartition(13), 16) == want16)
    assert(sk(df.repartition(1), 16) == want16)
  }

  test("distinct estimate brackets the truth at k=64 over 2000 keys and " +
      "matches the hand formula") {
    val k = 64
    val df = (1L to 2000L).map(_.toString).toDF("v")
      .select(conv(substring(md5(col("v")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val hashes = df.agg(KmvAgg.kmvMin(col("h"), k).as("s"))
      .select(col("s.hashes")).as[Seq[Long]].head()
    assert(hashes.length == k)
    val est = (BigInt(k - 1) * BigInt(KmvAgg.HashDomain) / hashes.last).toLong
    // ~1/sqrt(k-2) rsd ≈ 12.6%; 4 sigma leaves vanishing flake risk
    assert(math.abs(est - 2000L) < 1000L,
      s"KMV estimate $est implausibly far from 2000")
    // and the declarative read path computes the identical integer
    val viaSql = df.agg(KmvAgg.kmvMin(col("h"), k).as("s"))
      .select(expr(s"CAST(${k - 1} AS DECIMAL(38,0)) * " +
        s"CAST(${KmvAgg.HashDomain} AS DECIMAL(38,0)) div " +
        s"element_at(s.hashes, $k)").as("est"))
      .as[Long].head()
    assert(viaSql == est)
  }

  test("merge ≡ rebuild: min-k of unioned per-batch sketches equals the " +
      "full-corpus sketch slot-for-slot") {
    val k = 32
    val df = (1L to 900L).map(i => (i % 3, i.toString)).toDF("b", "v")
      .select(col("b"), conv(substring(md5(col("v")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val merged = df.groupBy(col("b"))
      .agg(KmvAgg.kmvMin(col("h"), k).as("s"))
      .agg(slice(array_sort(array_distinct(
        flatten(collect_list(col("s.hashes"))))), 1, k).as("m"))
      .select(col("m")).as[Seq[Long]].head()
    val full = df.agg(KmvAgg.kmvMin(col("h"), k).as("s"))
      .select(col("s.hashes")).as[Seq[Long]].head()
    assert(merged == full)
  }

  test("input contract: negative or out-of-domain hashes are rejected") {
    val agg = new KmvMinAgg(4)
    intercept[Exception](agg.reduce(agg.zero, -1L))
    intercept[Exception](agg.reduce(agg.zero, KmvAgg.HashDomain))
    intercept[IllegalArgumentException](new KmvMinAgg(1))
  }
}
