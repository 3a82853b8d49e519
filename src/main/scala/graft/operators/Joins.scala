package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for the shapes that matter at 100 TB (the reference never
  * tuned a join — SURVEY.md §2.5 notes no hints anywhere — so these are
  * engine-side affordances, not parity).
  *
  *   - [[bucketedTables]] (in Sinks) + a co-located join: two tables
  *     bucketed by the same key into the same bucket count join with NO
  *     exchange on either side — the pre-shuffled layout big fact-fact
  *     joins need.
  *   - [[saltedJoin]]: skew mitigation when one key dominates. AQE's skew
  *     handling splits oversized *partitions* at runtime; salting fixes the
  *     harder case where a single key exceeds one task's capacity, by
  *     spreading each hot key across `saltFactor` buckets and replicating
  *     the small side to every bucket.
  */
object Joins {

  /** Inner equi-join of a skewed large side against a small side with key
    * salting: large rows get a uniform salt in [0, saltFactor); the small
    * side is replicated once per salt value; the join key becomes
    * (key, salt) so one hot key fans out over saltFactor tasks. Result is
    * row-identical to the unsalted join. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      saltFactor: Int = 8): DataFrame = {
    val salted = large.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Broadcast-hint helper: the incremental-batch idiom (see
    * [[Incremental]]) as a reusable form. */
  def broadcastJoin(large: DataFrame, small: DataFrame, key: String,
      joinType: String = "inner"): DataFrame =
    large.join(broadcast(small), Seq(key), joinType)
}
