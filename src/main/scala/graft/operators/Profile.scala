package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Sources

/** Column-level data profiling — the "know your table before you train on
  * it" operator every ingest pipeline runs first (null rates, cardinality,
  * ranges, string lengths). The reference inspects schemas ad hoc
  * (`.printSchema()` in `scratchpads/delta_datalake.py`); this makes the
  * profile a first-class relational result.
  *
  * Scale design: ONE aggregation over the table produces every metric for
  * every column — a single scan, no per-column jobs. The exact distinct
  * counts make Catalyst plan an Expand (one duplicate of each row per
  * distinct aggregate) before the partial agg; that factor is the number
  * of profiled columns, which is fine for tens of columns but the 100 TB
  * knob to know about: swap [[exactProfile]]'s `countDistinct` for
  * `approx_count_distinct` (HyperLogLog++, no Expand, one pass, ~2%
  * error) when cardinality-estimate precision doesn't need to be exact.
  * The exact form stays the driver-checked oracle query. The final
  * rows-per-column pivot is an `explode` of a struct array built from the
  * one aggregate row — metadata-sized, no extra shuffle.
  */
object Profile {

  /** g17 — exact per-column profile: null count, exact distinct count,
    * numeric min/max (as rounded doubles), string min/max and mean length.
    * Output: one row per column of `df`. */
  def exactProfile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")

    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: fields.flatMap { f =>
      val c = col(f.name)
      val base = Seq(
        count(c).as(s"cnt_${f.name}"),
        countDistinct(c).as(s"nd_${f.name}"))
      val typed = f.dataType match {
        case _: NumericType => Seq(
          round(min(c).cast("double"), 6).as(s"mn_${f.name}"),
          round(max(c).cast("double"), 6).as(s"mx_${f.name}"))
        case StringType => Seq(
          min(c).as(s"mns_${f.name}"),
          max(c).as(s"mxs_${f.name}"),
          sum(length(c).cast("long")).as(s"len_${f.name}"))
        case _ => Seq.empty
      }
      base ++ typed
    }

    val one = df.agg(aggs.head, aggs.tail: _*)

    val rows = fields.map { f =>
      val (minNum, maxNum) = f.dataType match {
        case _: NumericType => (col(s"mn_${f.name}"), col(s"mx_${f.name}"))
        case _              => (nullD, nullD)
      }
      val (minStr, maxStr, avgLen) = f.dataType match {
        case StringType => (
          col(s"mns_${f.name}"), col(s"mxs_${f.name}"),
          round(col(s"len_${f.name}").cast("double") /
            nullif(col(s"cnt_${f.name}"), lit(0L)), 6))
        case _ => (nullS, nullS, nullD)
      }
      struct(
        lit(f.name).as("column_name"),
        lit(f.dataType.simpleString).as("data_type"),
        col("n_rows").as("n_rows"),
        (col("n_rows") - col(s"cnt_${f.name}")).as("n_nulls"),
        col(s"nd_${f.name}").as("n_distinct"),
        minNum.as("min_num"), maxNum.as("max_num"),
        minStr.as("min_str"), maxStr.as("max_str"),
        avgLen.as("avg_len"))
    }
    one.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }

  /** The registered g17 query: profile the `customer` table. */
  def customerProfile(spark: SparkSession, sfDir: String): DataFrame =
    exactProfile(Sources.testTable(spark, sfDir, "customer"))
}
