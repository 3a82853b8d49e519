package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.sources.Sources

/** Semi-structured (JSON) column handling — the `events.props` payload.
  *
  * The reference never parses JSON, but every real event/training-data
  * pipeline carries a JSON properties column, so this is first-class here.
  * The scale discipline: `from_json` with a DECLARED schema parses each
  * value exactly once into a typed struct inside whole-stage codegen —
  * repeated `get_json_object` calls re-parse the string per extraction,
  * and schema inference (`schema_of_json`) costs an extra pass. Keys not
  * in the declared schema are simply dropped; malformed JSON yields a
  * NULL struct (PERMISSIVE), so bad rows degrade to NULL aggregates
  * instead of failing the pipeline.
  */
object SemiStructured {

  /** Typed per-event-type stats over the JSON `props.k` field: one
    * `from_json` parse, exact long sum, avg derived from it. */
  def jsonPropsStats(spark: SparkSession, sfDir: String): DataFrame =
    Sources.testTable(spark, sfDir, "events")
      .select(col("event_type"),
        from_json(col("props"), StructType.fromDDL("k BIGINT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        round(sum(col("k")).cast("double") /
          count(col("k")).cast("double"), 6).as("avg_k"))
}
