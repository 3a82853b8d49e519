package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Cleanse
import graft.sources.Sources

/** Pins the reference's unicode cleanse semantics: split on '·' with a
  * conditional '★'-prefixed rating (custom/delta_table_write.py:61-68;
  * SURVEY.md §7.5 item 5 — the delimiters must survive source encoding). */
class CleanseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val schema = StructType(Seq(StructField("name", StringType)))

  test("airbnb cleanse: rating branch and no-rating branch (FIXTURES.md §1.2)") {
    val df = Sources.fromRows(spark, Seq(
      Row("Cozy loft · ★4.85 · 2 bedrooms · 2 beds · 1 bath"),
      Row("Studio near park · 1 bedroom · 1 bed · 1 shared bath")),
      schema)
    val out = Cleanse.airbnbCleanse(df).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSet
    assert(out == Set(
      ("Cozy loft", "4.85", "2 bedrooms", "2 beds", "1 bath"),
      ("Studio near park", null, "1 bedroom", "1 bed", "1 shared bath")))
  }

  test("listings cleanse on documents: no shuffle in the plan") {
    val q = Cleanse.listingsCleanse(spark, TestSpark.sf)
    assert(q.count() > 0)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("listings cleanse: rating null iff second token lacks marker") {
    import org.apache.spark.sql.functions._
    // independent recomputation of the marker condition from raw text
    val docs = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "documents")
      .select(col("doc_id"),
        // single-token docs have no second token: marker is absent, not null
        coalesce(split(col("text"), " ").getItem(1).startsWith("s"),
          lit(false)).as("has_marker"))
    val q = Cleanse.listingsCleanse(spark, TestSpark.sf)
      .select(col("doc_id"), col("rating"))
    val joined = q.join(docs, Seq("doc_id"))
    assert(joined.filter(col("has_marker") && col("rating").isNull)
      .count() == 0)
    assert(joined.filter(!col("has_marker") && col("rating").isNotNull)
      .count() == 0)
    // both branches actually occur in the corpus
    assert(joined.filter(col("has_marker")).count() > 0)
    assert(joined.filter(!col("has_marker")).count() > 0)
  }
}
