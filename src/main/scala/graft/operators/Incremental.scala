package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Workload C — CDC-style incremental load (SURVEY.md §2 rows J1-J4, P3-P4,
  * P6-P7, U1), re-expressed from `scratchpads/increamental_dataload.py` onto
  * the driver's `customer` table.
  *
  * The reference's pattern: given a base table and an incremental batch with
  * `inc_`-prefixed columns (`increamental_dataload.py:17-22` — the prefix is
  * its disambiguation discipline, SURVEY.md §7.5 item 3):
  *   1. changed rows  = inner join on key + any-field-differs filter (`:49-53`)
  *   2. new rows      = left-outer join + null-key filter (`:60`) — a
  *      left-anti join in disguise; we expose both forms
  *   3. apply updates = left-outer USING join + per-column coalesce (`:69-77`)
  *   4. append new    = union (`:85`)
  *
  * Scale design: an incremental batch is orders of magnitude smaller than the
  * base table, so every join here broadcasts the batch side — the base table
  * never shuffles. At 100 TB that is the difference between a metadata-sized
  * broadcast and re-hashing the whole lake. (The reference relied on
  * Catalyst's automatic choice with default thresholds.)
  */
object Incremental {

  /** Deterministic synthetic incremental batch derived from `customer`:
    * every even custkey arrives in the batch; keys %3==0 carry a changed
    * balance, %5==0 a changed segment; keys %7==0 additionally appear as
    * brand-new customers (key shifted by 1,000,000). Mirrors the literal-row
    * fixture of `increamental_dataload.py:37-45` at table scale. */
  def incrementalBatch(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Sources.testTable(spark, sfDir, "customer")
    // new-row keys live above max(c_custkey) so they can never collide with
    // a real customer at any scale factor (a fixed +1,000,000 offset would
    // collide once the base table passes 1M keys). Relational (scalar-agg
    // cross join, broadcast single row) so the oracle mirrors it exactly.
    val maxKey = c.agg(max(col("c_custkey")).as("max_key"))
    val updates = c.filter(col("c_custkey") % 2 === 0).select(
      col("c_custkey").as("inc_custkey"),
      col("c_name").as("inc_name"),
      col("c_nationkey").as("inc_nationkey"),
      when(col("c_custkey") % 3 === 0, col("c_acctbal") + 100.5)
        .otherwise(col("c_acctbal")).as("inc_acctbal"),
      when(col("c_custkey") % 5 === 0, lit("PREMIUM"))
        .otherwise(col("c_mktsegment")).as("inc_mktsegment"))
    val newRows = c.filter(col("c_custkey") % 7 === 0)
      .crossJoin(broadcast(maxKey)).select(
      (col("c_custkey") + col("max_key") + 1).as("inc_custkey"),
      concat(lit("NewCustomer#"), col("c_custkey").cast("string"))
        .as("inc_name"),
      col("c_nationkey").as("inc_nationkey"),
      col("c_acctbal").as("inc_acctbal"),
      col("c_mktsegment").as("inc_mktsegment"))
    updates.unionAll(newRows)
  }

  /** Driver-visible S6 — the reference's literal-rows incremental
    * pipeline replayed end-to-end over [[Sources.fromRows]]
    * (`increamental_dataload.py:25-93`, the golden fixture: 3 seed rows,
    * 4 incremental rows): changed-rows inner join + any-field-differs
    * filter, new-rows left-outer null probe, per-column coalesce merge,
    * positional union. The literal-collection SOURCE is the operator
    * under test; the pipeline proves those rows flow through the same
    * incremental idioms as the table-scale workload C. */
  def literalRowsPipeline(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    val df = Sources.fromRows(spark, Seq(
        Row(1, "Alice", 30, 50000),
        Row(2, "Bob", 35, 60000),
        Row(3, "Carol", 28, 45000)),
      StructType.fromDDL("id INT, name STRING, age INT, salary INT"))
    val inc = Sources.fromRows(spark, Seq(
        Row(1, "Alice", 30, 52000), // updated salary
        Row(2, "Bob", 29, 65000),   // updated age and salary
        Row(3, "Hari", 28, 47000),  // updated name and salary
        Row(4, "Dave", 40, 70000)), // new record
      StructType.fromDDL(
        "inc_id INT, inc_name STRING, inc_age INT, inc_salary INT"))
    val changed = df.join(inc, col("id") === col("inc_id"), "inner")
      .filter(col("salary") =!= col("inc_salary") ||
        col("name") =!= col("inc_name") ||
        col("age") =!= col("inc_age"))
      .select("inc_id", "inc_name", "inc_age", "inc_salary")
    val newRows = inc.join(df, col("id") === col("inc_id"), "left_outer")
      .filter(col("id").isNull)
      .select("inc_id", "inc_name", "inc_age", "inc_salary")
    val updated = df.join(
        changed.selectExpr("inc_id AS id", "inc_name", "inc_age",
          "inc_salary"),
        Seq("id"), "left_outer")
      .withColumn("name", coalesce(col("inc_name"), col("name")))
      .withColumn("age", coalesce(col("inc_age"), col("age")))
      .withColumn("salary", coalesce(col("inc_salary"), col("salary")))
      .drop("inc_name", "inc_age", "inc_salary")
    updated.union(newRows)
  }

  /** J1 + P6 — changed-record detection: inner join on key, keep batch rows
    * where any tracked field differs (`increamental_dataload.py:49-53`). */
  def changedRows(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Sources.testTable(spark, sfDir, "customer")
    val inc  = incrementalBatch(spark, sfDir)
    base.join(broadcast(inc),
        base("c_custkey") === inc("inc_custkey"), "inner")
      .filter(
        col("c_acctbal") =!= col("inc_acctbal") ||
        col("c_name") =!= col("inc_name") ||
        col("c_mktsegment") =!= col("inc_mktsegment"))
      .select("inc_custkey", "inc_name", "inc_nationkey",
        "inc_acctbal", "inc_mktsegment")
  }

  /** J2 + P7 — the reference's new-row detection verbatim: batch left-outer
    * base, filter base key IS NULL (`increamental_dataload.py:60`). */
  def newRowsLeftOuter(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Sources.testTable(spark, sfDir, "customer")
    val inc  = incrementalBatch(spark, sfDir)
    inc.join(base, inc("inc_custkey") === base("c_custkey"), "left_outer")
      .filter(base("c_custkey").isNull)
      .select("inc_custkey", "inc_name", "inc_nationkey",
        "inc_acctbal", "inc_mktsegment")
  }

  /** The idiomatic form of J2: a left-anti join — same rows, but the planner
    * never materializes the non-matching base columns. */
  def newRowsAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Sources.testTable(spark, sfDir, "customer")
      .select(col("c_custkey"))
    incrementalBatch(spark, sfDir)
      .join(base, col("inc_custkey") === col("c_custkey"), "left_anti")
  }

  /** SCD-2 apply: the reference carries SCD-2 columns on its silver tables
    * (IsActive/Version/ValidFrom/ValidTo, `financial_dl_etl.py:59-62`) but
    * only ever writes Version=1 snapshots — this completes the semantic.
    * Given the base dimension (seeded at version 1) and the changed-row
    * batch: unchanged rows pass through, each changed key's current row is
    * closed (is_active=false, valid_to=change date), and a new version+1
    * row opens. History is append-only and exactly one row per key is
    * active. Changed keys broadcast; the base never shuffles. */
  def scd2Apply(spark: SparkSession, sfDir: String): DataFrame = {
    val loadDate   = "2024-01-01"
    val changeDate = "2024-06-01"
    val base = Sources.testTable(spark, sfDir, "customer")
      .withColumn("is_active", lit(true))
      .withColumn("version", lit(1))
      .withColumn("valid_from", to_date(lit(loadDate)))
      .withColumn("valid_to", to_date(lit("2099-01-01")))
    // computed once (three consumers below) per the persist contract
    val changed = changedRows(spark, sfDir)
      .withColumnRenamed("inc_custkey", "c_custkey")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val changedKeys = changed.select(col("c_custkey"))

    // only the ACTIVE row of a changed key closes / versions forward —
    // already-closed history rows pass through untouched, so the operator
    // is correct on real multi-version history, not just v1 snapshots
    val active = base.filter(col("is_active"))
    val untouched = base.filter(!col("is_active"))
      .unionByName(active.join(broadcast(changedKeys), Seq("c_custkey"),
        "left_anti"))
    val closed = active.join(broadcast(changedKeys), Seq("c_custkey"))
      .withColumn("is_active", lit(false))
      .withColumn("valid_to", to_date(lit(changeDate)))
    val opened = active.select(col("c_custkey"), col("version"))
      .join(broadcast(changed), Seq("c_custkey"))
      .select(col("c_custkey"),
        col("inc_name").as("c_name"),
        col("inc_nationkey").as("c_nationkey"),
        col("inc_acctbal").as("c_acctbal"),
        col("inc_mktsegment").as("c_mktsegment"),
        lit(true).as("is_active"),
        (col("version") + 1).as("version"),
        to_date(lit(changeDate)).as("valid_from"),
        to_date(lit("2099-01-01")).as("valid_to"))
    untouched.unionByName(closed).unionByName(opened)
  }

  /** J3 + J4 + F8 + U1 + P4 — full upsert: apply changed rows to the base via
    * left-outer join + coalesce (`increamental_dataload.py:69-77`), then
    * union the new rows (`:85`) with a selectExpr-style rename (`:70`). */
  def upsert(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Sources.testTable(spark, sfDir, "customer")
    val changed = changedRows(spark, sfDir)
      .withColumnRenamed("inc_custkey", "c_custkey")
    val updated = base.join(broadcast(changed), Seq("c_custkey"), "left_outer")
      .withColumn("c_name", coalesce(col("inc_name"), col("c_name")))
      .withColumn("c_nationkey",
        coalesce(col("inc_nationkey"), col("c_nationkey")))
      .withColumn("c_acctbal", coalesce(col("inc_acctbal"), col("c_acctbal")))
      .withColumn("c_mktsegment",
        coalesce(col("inc_mktsegment"), col("c_mktsegment")))
      .drop("inc_name", "inc_nationkey", "inc_acctbal", "inc_mktsegment")
    val newRows = newRowsAnti(spark, sfDir).selectExpr(
      "inc_custkey as c_custkey", "inc_name as c_name",
      "inc_nationkey as c_nationkey", "inc_acctbal as c_acctbal",
      "inc_mktsegment as c_mktsegment")
    updated.unionByName(newRows)
  }
}
