package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Workload B — the packed-string cleanse pipeline (SURVEY.md §2 rows P1-P2,
  * P8, F1-F5), re-expressed from the Airbnb listings split
  * (`custom/delta_table_write.py:61-69`: split `name` on '·', conditionally
  * parse a '★'-prefixed rating, trim every part, drop raw columns) onto the
  * driver's `documents` table, whose space-separated `text` column plays the
  * packed field.
  *
  * The conditional-shift semantics are preserved exactly: when the second
  * part carries a marker prefix it is parsed as the rating and the remaining
  * fields shift right by one; otherwise the rating is NULL
  * (`custom/delta_table_write.py:62-68` — `when(...).otherwise(None)`).
  * The reference's '★' marker becomes the prefix "s" here (the unicode
  * handling itself is pinned by a unit test with the real '·'/'★' data,
  * SURVEY.md §7.5 item 5).
  *
  * Scale note: this is a pure narrow `Project` — one codegen'd stage over the
  * scan, no shuffle, trivially linear at 100 TB.
  */
object Cleanse {

  /** Marker prefix standing in for '★' in the test corpus. */
  private val Marker = "s"

  def listingsCleanse(spark: SparkSession, sfDir: String): DataFrame = {
    val parts = split(col("text"), " ")
    val p     = (i: Int) => parts.getItem(i)
    val hasRating = p(1).startsWith(Marker) // F5
    Sources.testTable(spark, sfDir, "documents")
      .withColumn("description", trim(p(0))) // F2/F3
      .withColumn("rating", // P8 + F4: conditional parse, NULL otherwise
        when(hasRating, trim(regexp_replace(p(1), "^" + Marker, "")))
          .otherwise(lit(null).cast("string")))
      .withColumn("reviews",
        when(hasRating, trim(p(2))).otherwise(trim(p(1))))
      .withColumn("bedrooms",
        when(hasRating, trim(p(3))).otherwise(trim(p(2))))
      .withColumn("beds",
        when(hasRating, trim(p(4))).otherwise(trim(p(3))))
      .drop("source", "text") // P2
  }

  /** The reference's exact unicode pipeline ('·' delimiter, '★' rating) for
    * literal-row fixtures — used by the unit spec to pin encoding behavior. */
  def airbnbCleanse(listings: DataFrame): DataFrame = {
    val parts = split(col("name"), "·")
    val p     = (i: Int) => trim(parts.getItem(i))
    val hasRating = p(1).startsWith("★")
    listings
      .withColumn("description", p(0))
      .withColumn("rating",
        when(hasRating, trim(regexp_replace(p(1), "★", "")))
          .otherwise(lit(null).cast("string")))
      .withColumn("reviews", when(hasRating, p(2)).otherwise(p(1)))
      .withColumn("bedrooms", when(hasRating, p(3)).otherwise(p(2)))
      .withColumn("beds", when(hasRating, p(4)).otherwise(p(3)))
      .drop("name")
  }
}
