package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Deterministic._
import graft.sources.Sources

/** Multi-way star join — the canonical warehouse query shape the reference
  * never exercises (SURVEY.md §2.5: only sequential two-table joins).
  * Revenue per region/nation over customer ⋈ orders ⋈ lineitem with the
  * dimension chain nation ⋈ region, TPC-H-Q5-flavored.
  *
  * Scale design: the two fact tables join on their shared key (one shuffle
  * each side, co-partitioned); every dimension (customer at 1% of
  * lineitem, nation, region) is broadcast — at 100 TB the only exchanges
  * are the two fact shuffles, and AQE re-plans the fact join if one side's
  * runtime size permits a broadcast. Revenue aggregates in exact decimal
  * (Deterministic discipline) keyed by low-cardinality names.
  */
object StarJoin {

  /** The joined star: one row per lineitem with (region, nation, revenue).
    * Two fact shuffles (lineitem ⋈ orders); every dimension broadcast. */
  private def starBase(spark: SparkSession, sfDir: String): DataFrame = {
    val lineitem = Sources.testTable(spark, sfDir, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"))
    val orders = Sources.testTable(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val customer = Sources.testTable(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val nation = Sources.testTable(spark, sfDir, "nation")
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val region = Sources.testTable(spark, sfDir, "region")
      .select(col("r_regionkey"), col("r_name"))

    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"), col("n_name").as("nation"),
        col("revenue"))
  }

  def revenueByNation(spark: SparkSession, sfDir: String): DataFrame =
    starBase(spark, sfDir)
      .groupBy(col("region"), col("nation"))
      .agg(
        sumExact(col("revenue")).as("total_revenue"),
        count(lit(1)).as("n_lineitems"))

  /** Multi-dimensional rollup — region → nation → grand total in ONE
    * aggregation pass: Catalyst expands ROLLUP grouping sets map-side, so
    * the plan is still partial+final hash agg with a single exchange, not
    * three separate jobs. `grouping_id` (standard SQL bit encoding, NULL
    * supergroup markers) matches DuckDB's `GROUPING()` exactly. */
  def revenueRollup(spark: SparkSession, sfDir: String): DataFrame =
    starBase(spark, sfDir)
      .rollup(col("region"), col("nation"))
      .agg(
        round(sumExact(col("revenue")).cast("double"), 6)
          .as("total_revenue"),
        count(lit(1)).as("n_lineitems"),
        grouping_id().as("gid"))

  /** Full CUBE over (region, nation) — every grouping-set combination in
    * ONE aggregation pass, the j3 ROLLUP's superset (adds the nation-only
    * supergroup the hierarchy-shaped rollup omits). Same physical shape as
    * rollup: Catalyst's Expand multiplies rows map-side by the 4 grouping
    * sets, then one partial+final hash agg with a single exchange — at
    * 100 TB the cost is the Expand factor (bounded by 2^dims), never extra
    * scans or jobs. `grouping_id` bit encoding matches DuckDB `GROUPING()`. */
  def revenueCube(spark: SparkSession, sfDir: String): DataFrame =
    starBase(spark, sfDir)
      .cube(col("region"), col("nation"))
      .agg(
        round(sumExact(col("revenue")).cast("double"), 6)
          .as("total_revenue"),
        count(lit(1)).as("n_lineitems"),
        grouping_id().as("gid"))

  /** Region-pivoted revenue per nation: `pivot` with EXPLICIT values (the
    * scale discipline — omitting them costs Spark an extra distinct scan
    * to discover the column set, and makes the output schema data-
    * dependent). Each nation belongs to one region, so off-region cells
    * are NULL — same as the portable CASE-sum encoding the oracle uses. */
  def revenuePivot(spark: SparkSession, sfDir: String): DataFrame =
    starBase(spark, sfDir)
      .groupBy(col("nation"))
      .pivot("region",
        Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"))
      .agg(round(sumExact(col("revenue")).cast("double"), 6))
}
