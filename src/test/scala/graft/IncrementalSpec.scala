package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Incremental
import graft.sources.Sources

/** Pins the reference's golden literal-row semantics
  * (increamental_dataload.py:25-45: base {Alice,Bob,Carol}, incremental
  * {Alice',Bob',Hari',Dave} → 3 changed, 1 new, final 4 rows) through the
  * same join/filter/coalesce/union plan our table-scale queries use. */
class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val baseSchema = StructType(Seq(
    StructField("id", IntegerType), StructField("name", StringType),
    StructField("age", IntegerType), StructField("salary", IntegerType)))
  val incSchema = StructType(Seq(
    StructField("inc_id", IntegerType), StructField("inc_name", StringType),
    StructField("inc_age", IntegerType), StructField("inc_salary", IntegerType)))

  def fixtures = {
    val base = Sources.fromRows(spark, Seq(
      Row(1, "Alice", 30, 50000), Row(2, "Bob", 35, 60000),
      Row(3, "Carol", 28, 45000)), baseSchema)
    val inc = Sources.fromRows(spark, Seq(
      Row(1, "Alice", 30, 52000), Row(2, "Bob", 29, 65000),
      Row(3, "Hari", 28, 47000), Row(4, "Dave", 40, 70000)), incSchema)
    (base, inc)
  }

  test("golden fixture: 3 changed, 1 new, final 4 rows with updates applied") {
    val (base, inc) = fixtures
    val changed = base.join(inc, col("id") === col("inc_id"), "inner")
      .filter(col("salary") =!= col("inc_salary") ||
        col("name") =!= col("inc_name") || col("age") =!= col("inc_age"))
      .select("inc_id", "inc_name", "inc_age", "inc_salary")
    assert(changed.count() == 3)

    val newRows = inc.join(base, col("inc_id") === col("id"), "left_outer")
      .filter(col("id").isNull)
      .select("inc_id", "inc_name", "inc_age", "inc_salary")
    assert(newRows.collect().map(_.getInt(0)).toSeq == Seq(4))

    val updated = base
      .join(changed.withColumnRenamed("inc_id", "id"), Seq("id"), "left_outer")
      .withColumn("name", coalesce(col("inc_name"), col("name")))
      .withColumn("age", coalesce(col("inc_age"), col("age")))
      .withColumn("salary", coalesce(col("inc_salary"), col("salary")))
      .drop("inc_name", "inc_age", "inc_salary")
    val finalDf = updated.unionByName(newRows.selectExpr(
      "inc_id as id", "inc_name as name", "inc_age as age",
      "inc_salary as salary"))
    val rows = finalDf.collect().map(r =>
      (r.getInt(0), r.getString(1), r.getInt(2), r.getInt(3))).toSet
    assert(rows == Set(
      (1, "Alice", 30, 52000), (2, "Bob", 29, 65000),
      (3, "Hari", 28, 47000), (4, "Dave", 40, 70000)))
  }

  test("left-outer+isNull and left-anti agree on new-row detection") {
    val a = Incremental.newRowsLeftOuter(spark, TestSpark.sf)
      .select("inc_custkey").collect().map(_.getLong(0)).toSet
    val b = Incremental.newRowsAnti(spark, TestSpark.sf)
      .select("inc_custkey").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
    // new keys live strictly above the base key range at every scale
    val maxBase = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "customer")
      .agg(org.apache.spark.sql.functions.max("c_custkey"))
      .collect()(0).getLong(0)
    assert(a.forall(_ > maxBase))
  }

  test("upsert preserves base cardinality + new rows, applies changes") {
    val base = Sources.testTable(spark, TestSpark.sf, "customer")
    val up = Incremental.upsert(spark, TestSpark.sf)
    val nNew = Incremental.newRowsAnti(spark, TestSpark.sf).count()
    assert(up.count() == base.count() + nNew)
    // every key%30==0 (even, %3, %5) BASE customer must carry both changes
    val maxBase = base.agg(org.apache.spark.sql.functions.max("c_custkey"))
      .collect()(0).getLong(0)
    val touched = up.filter(col("c_custkey") % 30 === 0 &&
      col("c_custkey") <= maxBase)
    assert(touched.filter(col("c_mktsegment") =!= "PREMIUM").count() == 0)
  }

  test("scd2: history append-only, exactly one active row per key, versions step") {
    import graft.sources.Sources
    val s = Incremental.scd2Apply(spark, TestSpark.sf)
    val base = Sources.testTable(spark, TestSpark.sf, "customer")
    val nChanged = Incremental.changedRows(spark, TestSpark.sf).count()
    // every base row survives (open or closed) + one new version per change
    assert(s.count() == base.count() + nChanged)
    val perKeyActive = s.filter(col("is_active"))
      .groupBy("c_custkey").count().filter(col("count") =!= 1).count()
    assert(perKeyActive == 0)
    // changed keys: closed v1 (valid_to = change date) + open v2
    val changedKey = s.filter(col("version") === 2)
    assert(changedKey.count() == nChanged)
    assert(changedKey.filter(!col("is_active")).count() == 0)
    val closed = s.filter(!col("is_active"))
    assert(closed.count() == nChanged)
    assert(closed.filter(col("valid_to") =!=
      java.sql.Date.valueOf("2024-06-01")).count() == 0)
  }

  test("incremental joins broadcast the batch side") {
    val plan = Incremental.upsert(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }
}
