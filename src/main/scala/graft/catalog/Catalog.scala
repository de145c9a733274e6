package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checked query: a Spark DataFrame program plus (optionally) the
  * ANSI SQL a DuckDB oracle runs over the same Parquet tables to verify it
  * (driver contract — see the builder prompt and `graft.SparkEntry`).
  *
  * Conventions that make the hash-compare robust (SURVEY §5):
  *  - every computed column is aliased IDENTICALLY on both sides;
  *  - deterministic total ORDER BY on both sides;
  *  - float aggregates rounded (2-6 dp) on both sides;
  *  - integer-ish outputs cast to BIGINT on both sides (DuckDB sum(int) is
  *    HUGEINT, Spark size() is INT — both normalized);
  *  - timestamps emitted as `unix_timestamp(x)` ↔
  *    `epoch(date_trunc('second', x))::BIGINT` (truncation, not rounding).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait Catalog {
  def all: Seq[Q]
  final def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap
  final def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
