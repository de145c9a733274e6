package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchSpec extends SparkSpec {

  import spark.implicits._

  test("heavyHittersCms: exact top-k with the CMS contract holding") {
    // planted skew: key 7 dominates, then 3, then a uniform tail
    val df = ((1 to 600).map(_ => 7L) ++ (1 to 300).map(_ => 3L) ++
      (1 to 1000).map(i => (i % 50) + 100L)).toDF("k")
    val out = Sketch.heavyHittersCms(df, col("k"), k = 4)
      .orderBy(col("exact_n").desc, col("key")).collect()
    assert(out.length == 4)
    assert(out(0).getLong(0) == 7L && out(0).getLong(1) == 600L)
    assert(out(1).getLong(0) == 3L && out(1).getLong(1) == 300L)
    // every verdict true: estimate in [exact, exact + eps*N]
    assert(out.forall(_.getBoolean(2)))
  }

  test("heavyHittersCms works for string keys") {
    val df = (Seq.fill(40)("en") ++ Seq.fill(25)("de") ++ Seq.fill(5)("fr"))
      .toDF("lang")
    val out = Sketch.heavyHittersCms(df, col("lang"), k = 2).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("en", 40L), ("de", 25L)))
    assert(out.forall(_.getBoolean(2)))
  }

  test("heavyHittersCms: ties broken by key ascending (deterministic)") {
    val df = (Seq.fill(10)(5L) ++ Seq.fill(10)(2L) ++ Seq.fill(10)(9L))
      .toDF("k")
    val out = Sketch.heavyHittersCms(df, col("k"), k = 2).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(2L, 5L))
  }
}
