package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Batch text-format sources (CSV / JSON-lines) with DECLARED schemas and an
  * explicit corrupt-record policy — the ingestion edge the parquet corpus
  * never exercises.
  *
  * Design rules (scale + correctness):
  *  - Schemas are always declared, never inferred: inference is a full extra
  *    pass over the data at 100 TB AND nondeterministic under sampling.
  *  - PERMISSIVE mode with a named corrupt-record column: a bad line becomes
  *    a row with nulls + the raw text in `_corrupt_record`, so ingestion
  *    never aborts mid-scan and bad records are quarantineable — same
  *    degrade-don't-abort stance as the reference's per-endpoint error
  *    handling (etl/pipeline.py:105-110).
  *  - Both formats are splittable line formats: a directory of files (or one
  *    huge file) parallelizes by HDFS/S3 block, no code change.
  */
object TextSources {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, "string")

  /** JSON-lines with declared schema; malformed lines land in
    * `_corrupt_record` instead of killing the scan.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** CSV with declared schema and header; malformed lines land in
    * `_corrupt_record`.
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  /** Split a PERMISSIVE read into (clean, quarantined): clean rows drop the
    * corrupt column; quarantined rows keep only the raw line for triage.
    * The parsed frame is persisted first — Spark refuses a projection that
    * references ONLY the corrupt column against a raw file scan
    * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    * quarantine branch is exactly that shape; the cache also means the two
    * branches parse each input line once between them.
    */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) = {
    val parsed = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (parsed.filter(col(CorruptCol).isNull).drop(CorruptCol),
      parsed.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw")))
  }
}
