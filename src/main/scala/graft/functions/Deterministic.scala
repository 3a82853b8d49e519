package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism discipline for oracle-checked aggregates.
  *
  * The driver hash-compares every query result against DuckDB (SURVEY.md §5).
  * Floating-point `sum`/`avg`/`stddev` over doubles are partition-order
  * dependent in Spark and accumulation-order dependent in DuckDB, so raw
  * double aggregation can never hash-match reliably. The discipline used by
  * every oracle-checked query in this library:
  *
  *   1. Per-row scalar math stays in IEEE double — identical expressions
  *      evaluate bit-identically in any engine.
  *   2. Aggregation happens in DECIMAL(38,10) — decimal addition is exact and
  *      associative, so the sum is independent of partition order and equals
  *      DuckDB's decimal sum bit-for-bit.
  *   3. Derived statistics (avg, stddev) are computed from the exact decimal
  *      sums with the *same* double expression tree on both sides, then
  *      rounded to 6 decimals.
  *
  * This also fixes the reference's own nondeterminism hazard: its
  * `first`/`last` aggregates (`financial_dl_etl.py:56-57`) only looked stable
  * because its data had one row per group. We use `min_by`/`max_by` over a
  * unique ordering key instead (SURVEY.md §7.5 item 1).
  */
object Deterministic {

  val Dec38: DecimalType = DecimalType(38, 10)

  /** Exact-aggregation cast: double → DECIMAL(38,10). */
  def dec(c: Column): Column = c.cast(Dec38)

  /** Order-independent sum of a double column (exact decimal accumulation). */
  def sumExact(c: Column): Column = sum(dec(c))

  /** avg to 6 decimals from an exact decimal sum + a count, evaluated in
    * double with a fixed expression shape (must mirror the oracle SQL). */
  def avg6(sumDec: Column, cnt: Column): Column =
    round(sumDec.cast("double") / cnt, 6)

  /** Driver-boundary projection: every DecimalType column becomes
    * `round(cast(x as double), 6)`, everything else passes through.
    *
    * The driver's correctness gate hashes query output through a pandas
    * frame: parquet DECIMAL columns arrive as Python `Decimal` objects
    * while DuckDB's `.df()` hands over floats — they can never hash equal
    * even when the values are identical (round-1 CORRECTNESS: all 8
    * hash_match=false queries had a decimal output column; every query
    * without one passed). So decimal stays the *internal* accumulation
    * type (exact, order-independent — the whole point of [[sumExact]])
    * and the driver-facing schema is DOUBLE rounded to 6, mirrored
    * verbatim in the oracle SQL. */
  def doubleBoundary(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType => round(col(f.name).cast("double"), 6).as(f.name)
        case _              => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Sample standard deviation from exact sums: round(sqrt(max((ss - s²/n)
    * / (n-1), 0)), 6), NULL for n<2. Expression shape mirrors the oracle. */
  def stddev6(sumDec: Column, sumSqDec: Column, cnt: Column): Column = {
    val s  = sumDec.cast("double")
    val ss = sumSqDec.cast("double")
    val n  = cnt.cast("double")
    when(cnt > 1,
      round(sqrt(greatest((ss - s * s / n) / (n - lit(1.0)), lit(0.0))), 6))
      .otherwise(lit(null).cast("double"))
  }
}
