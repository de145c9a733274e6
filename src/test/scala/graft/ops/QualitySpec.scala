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
}
