package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the time-series primitive Spark
  * has no native operator for, composed from existing ops per the
  * escalation order: tag both sides, union, and take a running `max` over
  * a (time, id) STRUCT inside a per-key ordered window. Struct comparison
  * is lexicographic in both Spark and DuckDB and `max` ignores NULLs (the
  * probe side contributes none), so the composition is engine-portable
  * and exactly oracle-checkable — no custom LogicalPlan/Strategy needed.
  *
  * Scale shape: ONE shuffle on the join key, then a linear per-partition
  * window pass — strictly cheaper than the naive inequality join
  * (O(n·m) per key) and the same cost class as a native as-of operator.
  * Ties at equal timestamps resolve by event id (the unique order key),
  * identically in both engines.
  */
object AsOf {

  /** Core transform over a tagged frame (user_id, event_id, us, is_view):
    * each non-view row gets the most recent view at-or-before it in
    * (us, event_id) order — at equal timestamps, rows with a smaller id
    * are "before". Exposed for fixture-level semantics specs. */
  private[graft] def lastViewCore(tagged: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged.withColumn("lv",
        max(when(col("is_view"), struct(col("us"), col("event_id"))))
          .over(w))
      .filter(!col("is_view"))
      .select(col("user_id"), col("event_id").as("click_id"),
        col("lv.event_id").as("view_id"),
        (col("us") - col("lv.us")).as("gap_us"))
  }

  /** Attribution query: for every click, the user's most recent view at
    * or before it ((ts, event_id) order), NULL when none precedes. */
  def lastViewBeforeClick(spark: SparkSession, sfDir: String): DataFrame =
    lastViewCore(
      graft.streaming.Streaming.eventsBatch(spark, sfDir)
        .filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          (col("event_type") === "view").as("is_view")))
}
