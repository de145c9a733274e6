package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.types.StructType

/** Ingestion-edge semantics: declared schemas, PERMISSIVE corrupt-record
  * capture, clean/quarantine split.
  */
class TextSourcesSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType.fromDDL("id BIGINT, name STRING, score DOUBLE")

  private def write(path: String, lines: Seq[String]): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.mkString("\n").getBytes("UTF-8"))

  test("jsonl: malformed lines are quarantined, clean rows parse fully") {
    val dir = tmpDir("jsonl")
    write(s"$dir/part1.jsonl", Seq(
      """{"id": 1, "name": "alpha", "score": 0.5}""",
      """this is not json at all""",
      """{"id": 2, "name": "beta", "score": 1.25}""",
      """{"id": "not-a-number", "name": "gamma", "score": 2.0}"""))
    val (clean, bad) = TextSources.quarantine(
      TextSources.readJsonl(spark, dir, schema))
    assert(clean.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "alpha", 0.5), (2L, "beta", 1.25)))
    val rawBad = bad.as[String].collect()
    assert(rawBad.length == 2)
    assert(rawBad.exists(_.contains("not json")))
    assert(rawBad.exists(_.contains("not-a-number")))
  }

  test("csv: header + declared schema; type-mismatched lines quarantined") {
    val dir = tmpDir("csv")
    write(s"$dir/part1.csv", Seq(
      "id,name,score",
      "1,alpha,0.5",
      "oops,beta,not-a-double",
      "3,gamma,2.5"))
    val (clean, bad) = TextSources.quarantine(
      TextSources.readCsv(spark, dir, schema))
    assert(clean.as[(Long, String, Double)].collect().toSet ==
      Set((1L, "alpha", 0.5), (3L, "gamma", 2.5)))
    assert(bad.as[String].collect().toSeq == Seq("oops,beta,not-a-double"))
  }

  test("a directory of many files reads as one relation") {
    val dir = tmpDir("many")
    (1 to 5).foreach(i =>
      write(s"$dir/f$i.jsonl", Seq(s"""{"id": $i, "name": "n$i", "score": $i.0}""")))
    val (clean, bad) = TextSources.quarantine(
      TextSources.readJsonl(spark, dir, schema))
    assert(clean.count() == 5 && bad.count() == 0)
  }
}
