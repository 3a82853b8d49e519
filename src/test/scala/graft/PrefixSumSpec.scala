package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PrefixSum

/** The distributed prefix sum must be BIT-IDENTICAL to the
  * single-window form it replaces (offset + partition-local prefix =
  * global prefix wherever the range boundaries fall), including a
  * skewed group far larger than one range partition and a NULL group
  * key. */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("runningSum equals the per-group window, incl. skew and NULLs") {
    CacheScope.withScope {
      // one dominant group (the majority-language shape), several small
      // ones, and a NULL group; values vary so prefix errors can't cancel
      val df = (0 until 5000).map { i =>
        val g = if (i % 10 < 7) "big"
          else if (i % 10 == 7) "s1" else if (i % 10 == 8) "s2" else null
        (g, i.toLong, (i % 17 + 1).toLong)
      }.toDF("g", "id", "v").repartition(8)
      val got = PrefixSum.runningSum(df, "g", Seq(col("id")), "v", "run")
        .select("g", "id", "run").collect()
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
        .toSet
      val w = Window.partitionBy(col("g")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.withColumn("run", sum(col("v")).over(w))
        .select("g", "id", "run").collect()
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
        .toSet
      assert(got == want)
      // descending / computed order keys work too (the g24 shape)
      val gotDesc = PrefixSum.runningSum(df, "g",
          Seq(col("v").desc, col("id").asc), "v", "run")
        .select("g", "id", "run").collect()
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
        .toSet
      val wDesc = Window.partitionBy(col("g"))
        .orderBy(col("v").desc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wantDesc = df.withColumn("run", sum(col("v")).over(wDesc))
        .select("g", "id", "run").collect()
        .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2)))
        .toSet
      assert(gotDesc == wantDesc)
    }
  }
}
