package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-arithmetic helpers for cross-engine-deterministic aggregation.
  *
  * Rationale (SURVEY §7.4 "float determinism vs DuckDB oracle"): summing
  * doubles is order-dependent, and Spark and the DuckDB oracle sum in
  * different orders — `round(sum(x), 2)` can land on opposite sides of a
  * rounding boundary. The corpus's money-like columns are exact 2-decimal
  * values and quantities are integral (verified against the test data), so
  * aggregating SCALED BIGINTs is exact, order-independent, and bit-identical
  * in every engine; a single final division by a power of ten (two exact
  * operands) is IEEE-identical everywhere. The same pattern in oracle SQL:
  * `CAST(round(x * 100) AS BIGINT)` … `sum(...)::DOUBLE / 100.0`.
  *
  * Range note for 100 TB: cent-scaled sums stay exact while they fit 2^53
  * when converted back to double (~9e15 = $90T in cents) — beyond that,
  * switch the output to the BIGINT cents themselves or DecimalType.
  */
object Exact {

  /** 2-dp money column → exact integer cents. */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Integral-valued double column → exact BIGINT. */
  def asLong(c: Column): Column = round(c).cast("long")

  /** Exact cents sum → dollars (single exact division). */
  def dollars(sumCents: Column): Column = sumCents.cast("double") / 100.0

  /** Extended-price revenue term `price * (1 - discount)` in exact
    * price-cents × discount-percent units (scale 10^4).
    */
  def revenueUnits(price: Column, discount: Column): Column =
    cents(price) * (lit(100L) - cents(discount))

  /** Scale-10^4 revenue sum → dollars. */
  def revenueDollars(sumUnits: Column): Column = sumUnits.cast("double") / 10000.0

  /** Exact average of an integer sum: one IEEE division of exact operands. */
  def avgOf(sum: Column, n: Column): Column = sum.cast("double") / n

  /** Deterministic scaled ratio: floor(num * 10^4 / den) — floor has no
    * tie-rounding rule, so engines cannot disagree. Used for ratio metrics
    * over exact integer numerators/denominators ("basis points").
    */
  def ratioBp(num: Column, den: Column): Column =
    floor(num.cast("double") * 10000 / den).cast("long")
}
