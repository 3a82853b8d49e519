package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.sources.BaseRelation

/** The one `private[sql]` bridge this library needs, placed under
  * `org.apache.spark.sql` the same way Delta's connector is: a V1
  * streaming `Source.getBatch` must return a DataFrame whose logical
  * plan is tagged `isStreaming = true` (MicroBatchExecution asserts it),
  * and the only constructors for that tag — `LogicalRelation(rel,
  * isStreaming)` + `Dataset.ofRows` — are package-private to
  * `org.apache.spark.sql`. This is exactly how Spark's own
  * FileStreamSource builds its batches. */
object StreamBatch {

  /** A DataFrame over `rel` with the streaming tag set. */
  def ofRelation(spark: SparkSession, rel: BaseRelation): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession],
      LogicalRelation(rel, isStreaming = true))

  /** A DataFrame over an already-analyzed logical plan — the SQL DML
    * rewrite uses this to hand MERGE's resolved source subplan to the
    * transactional merge as a plain DataFrame (Delta's commands do the
    * same through their own `Dataset.ofRows` access). */
  def ofPlan(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** A DataFrame's analyzed logical plan — the inverse of [[ofPlan]],
    * used by the table_changes TVF builder (a TVF resolves to a
    * LogicalPlan, and the classic Dataset's plan accessor is
    * `private[sql]`). */
  def planOf(df: DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** The inverse of [[ofRelation]], for a V1 streaming `Sink.addBatch`:
    * the incoming micro-batch DataFrame carries the streaming tag, so
    * ordinary writers refuse it. Re-wrap the EXECUTED rows (`toRdd` of
    * the incremental plan — each batch row copied out of the unsafe
    * buffer) as a plain batch frame, exactly the de-streaming hop
    * Spark's own sinks perform. */
  def materialize(data: DataFrame): DataFrame = {
    val spark = data.sparkSession.asInstanceOf[ClassicSession]
    spark.internalCreateDataFrame(
      data.queryExecution.toRdd.map(_.copy()), data.schema,
      isStreaming = false)
  }
}
