package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Deterministic._
import graft.sources.Sources

/** Window-function analytics over the financial daily series — the
  * classic OLAP surface (lag returns, moving averages, per-key ranks)
  * the reference's OHLCV domain implies but never writes down
  * (SURVEY.md §2.7 is empty in the reference; `financial_dl_etl.py:53-58`
  * stops at per-day aggregates). Re-keyed like [[Medallion]]:
  * `(trade_date, ticker)` = `(CAST(l_shipdate AS DATE), l_returnflag)`.
  *
  * Scale design: all four window specs share ONE partitioning key
  * (`ticker`), so the physical plan is a single hash exchange on ticker
  * followed by one sort per ordering — no per-window re-shuffle. Ticker
  * cardinality is low here, but the pattern holds for any high-cardinality
  * key (per-symbol series at 100 TB partition evenly); a LOW-cardinality
  * key with huge per-key history is the one shape windows can't save —
  * that data wants pre-bucketing by (key, time-range), not a bigger
  * window. Aggregation feeding the windows follows the [[Deterministic]]
  * discipline: decimal-exact daily closes, double math only in fixed
  * per-row expression shapes, rounded at the driver boundary.
  */
object Windows {

  /** Unique per-row ordering key (same construction as Medallion's):
    * `l_linenumber` is 1..7 within an order, so `l_orderkey*10 +
    * l_linenumber` is globally unique — makes `max_by` a deterministic
    * stand-in for the reference's order-unstable `last()`. */
  private def seqKey = col("l_orderkey") * 10 + col("l_linenumber")

  /** j9 — daily returns + 7-day moving average + volume rank per ticker:
    *   - `daily_return` = close / lag(close) − 1 (NULL on each ticker's
    *     first day, like any price series);
    *   - `ma7_close` = mean close over the trailing 7 rows, computed as
    *     exact-decimal window sum / window count so partition order can't
    *     perturb the value;
    *   - `day_idx` = row_number in trade-date order;
    *   - `vol_rank` = rank by total daily volume (ties broken only in
    *     the ORDER BY date, so `rank` itself is tie-stable).
    */
  /** j10 — EXACT percentile aggregation (p50/p90 of daily revenue per
    * ticker): `percentile` is the sort-based exact aggregate, linearly
    * interpolated at (n−1)·p — the same definition as DuckDB's
    * `quantile_cont`, so the oracle is exact. Inputs are decimal-exact
    * daily sums cast to double, making the interpolation arithmetic
    * bit-identical on both sides. Exact percentile buffers each GROUP's
    * values (fine for per-key daily series); the corpus-wide unbounded
    * analog is `approx_percentile` (KLL/GK-style, mergeable) — same
    * swap discipline as g5 → g13. */
  def dailyPercentiles(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Sources.testTable(spark, sfDir, "lineitem")
      .withColumn("trade_date", to_date(col("l_shipdate")))
      .withColumn("rev",
        col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .groupBy(col("trade_date"), col("l_returnflag").as("ticker"))
      .agg(sumExact(col("rev")).as("rev_dec"))
      .withColumn("rev_d", col("rev_dec").cast("double"))
    daily
      .groupBy(col("ticker"))
      .agg(
        count(lit(1)).as("n_days"),
        round(percentile(col("rev_d"), lit(0.5)), 6).as("p50_revenue"),
        round(percentile(col("rev_d"), lit(0.9)), 6).as("p90_revenue"),
        round(min(col("rev_d")), 6).as("min_revenue"),
        round(max(col("rev_d")), 6).as("max_revenue"))
  }

  def dailyReturns(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Sources.testTable(spark, sfDir, "lineitem")
      .withColumn("trade_date", to_date(col("l_shipdate")))
      .withColumn("seq", seqKey)
      .groupBy(col("trade_date"), col("l_returnflag").as("ticker"))
      .agg(
        dec(max_by(col("l_extendedprice"), col("seq"))).as("close_dec"),
        sumExact(col("l_quantity")).as("vol_dec"))

    val w  = Window.partitionBy(col("ticker")).orderBy(col("trade_date"))
    val w7 = w.rowsBetween(-6, Window.currentRow)
    val wv = Window.partitionBy(col("ticker"))
      .orderBy(col("vol_dec").desc, col("trade_date").asc)

    daily
      .withColumn("prev_dec", lag(col("close_dec"), 1).over(w))
      .withColumn("ma7_sum", sum(col("close_dec")).over(w7))
      .withColumn("ma7_n", count(lit(1)).over(w7))
      .withColumn("day_idx", row_number().over(w))
      .withColumn("vol_rank", rank().over(wv))
      .select(
        col("trade_date"), col("ticker"),
        round(col("close_dec").cast("double"), 6).as("close"),
        round(col("close_dec").cast("double") / col("prev_dec").cast("double")
          - 1.0, 6).as("daily_return"),
        round(col("ma7_sum").cast("double") / col("ma7_n"), 6)
          .as("ma7_close"),
        col("day_idx"), col("vol_rank"))
  }
}
