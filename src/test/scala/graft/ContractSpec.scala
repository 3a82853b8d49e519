package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants — the shape the external gate depends on. */
class ContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every query carries an oracle (zero rows-only entries)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o,
      s"queries without oracle: ${(q -- o).toSeq.sorted.mkString(", ")}; " +
        s"oracles without query: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }

  test("flagship entry returns rows (driver smoke gate)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("no driver-facing schema carries DECIMAL or array columns") {
    // parquet DECIMAL arrives driver-side as Python Decimal (never
    // hash-equal to the oracle's floats); arrays crash the pandas sort —
    // see Deterministic.doubleBoundary. Constructing a query frame is
    // analysis-only for most entries; the DDL/stream ones execute their
    // (sf0.001-sized) side effects, which keeps this spec honest about
    // the schema the driver actually receives.
    SparkEntry.queries.foreach { case (name, fn) =>
      val schema = fn(spark, TestSpark.sf).schema
      schema.fields.foreach { f =>
        val t = f.dataType.typeName
        assert(t != "decimal" && !t.startsWith("decimal(") &&
          t != "array" && t != "map",
          s"$name.${f.name} is $t — driver hash will fail")
      }
    }
    spark.catalog.clearCache()
  }
}
