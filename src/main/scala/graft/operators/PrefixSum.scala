package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running prefix-sum — the scale-safe replacement for
  * `Window.partitionBy(group).orderBy(order)` with an unbounded running
  * `sum`. That shape funnels every row of a group through ONE task: at
  * the 100 TB target a real pretraining corpus is ~half one language,
  * so the packing family (g16/g23/g24, e22 stage 5) would sort and
  * prefix-sum ~50 TB in a single task. This helper is the same pattern
  * the t31 identity allocator uses (count-per-partition prefix offsets
  * + a partition-local stamping pass — SCALE.md "no single-partition
  * window"), lifted to declarative DataFrame form:
  *
  *  1. `repartitionByRange(n, group +: order)` — each output partition
  *     holds a CONTIGUOUS slice of the (group, order) total order, so
  *     a group may span many partitions and no partition outgrows the
  *     range-partitioner's balanced share.
  *  2. Aggregate per-(partition, group) subtotals of `value` — a tiny
  *     frame (≤ partitions × groups rows).
  *  3. On that tiny frame only, a window per group ordered by partition
  *     id computes each partition's starting offset (exclusive prefix).
  *  4. Broadcast-join the offsets back and run the running sum in a
  *     window partitioned by (partition id, group) — every window group
  *     is bounded by the range-partition size, never by group size.
  *
  * The answer is partition-boundary-invariant: offset + local prefix
  * equals the global prefix under the (group, order) total order
  * wherever the range boundaries fall, so callers' results are
  * bit-identical to the single-window form (the driver oracles pin
  * this). `order` must be a deterministic total order within each
  * group (every caller tie-breaks on a unique id).
  *
  * The ranged frame is consumed twice (subtotals + stamping) and is
  * persisted via [[graft.CacheScope]] so the range exchange and
  * `spark_partition_id` assignment are computed once.
  */
object PrefixSum {

  /** Append `out` = running inclusive sum of `value` over rows ordered
    * by (`group`, `order*`), restarting per `group` — semantically
    * `sum(value) OVER (PARTITION BY group ORDER BY order* ROWS
    * UNBOUNDED PRECEDING)`, computed without any per-group single
    * task. `order` columns may be expressions (e.g. a computed quality
    * score `.desc`); the caller's frame must contain `group` and
    * `value` as named columns. */
  def runningSum(df: DataFrame, group: String, order: Seq[Column],
      value: String, out: String): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = graft.CacheScope.tracked(
      df.repartitionByRange(n, (col(group) +: order): _*)
        .withColumn("__psum_pid", spark_partition_id()))
    // tiny frame: one row per (partition, group)
    val offsets = ranged.groupBy(col("__psum_pid"), col(group))
      .agg(sum(col(value)).as("__psum_part"))
      .withColumn("__psum_offset",
        coalesce(sum(col("__psum_part")).over(
          Window.partitionBy(col(group)).orderBy(col("__psum_pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__psum_part")
    val local = Window
      .partitionBy(col("l.__psum_pid"), col(s"l.$group"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null-safe on the group key: a NULL group is one window partition
    // in the reference semantics, so the offset join must match it too
    ranged.alias("l")
      .join(broadcast(offsets.alias("r")),
        col("l.__psum_pid") === col("r.__psum_pid") &&
          col(s"l.$group") <=> col(s"r.$group"))
      .select((df.columns.map(c => col(s"l.$c")) :+
        (col("r.__psum_offset") + sum(col(s"l.$value")).over(local))
          .as(out)): _*)
  }
}
