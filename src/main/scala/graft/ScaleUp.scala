package graft

import org.apache.spark.sql.functions._

/** Materialize an N× scaled replica of a testdata directory for scale
  * validation (BASELINE.md / SCALE.md): each table becomes N key-shifted
  * copies, unioned and written in the same `<table>.parquet` layout, so
  * every registered query runs against it unchanged.
  *
  * The shift is applied to every KEY column (primary and foreign) with one
  * shared offset per replica, so referential joins stay consistent — a
  * replica is a parallel universe of the same lake, which is exactly what
  * grows the join/aggregate key cardinality the way real scale does
  * (pure row duplication without key shifts would instead grow group SIZES
  * and leave key counts flat, a much easier workload). Non-key values are
  * unchanged; that means replicated documents/embeddings are exact
  * duplicates of their originals, which stress-tests the dedup pipelines
  * with genuine cross-replica duplicate clusters (each doc gains N-1
  * identical twins that LSH bands MUST collide).
  *
  * Replica 0 is byte-identical to the source, preserving contracts pinned
  * to low ids (data-derived LSH planes need vec_id 0..2tb-1,
  * Similarity.scala; e2/e5's documented id bounds).
  *
  * Offset 10M clears every sf0.1 key domain by >5× and keeps r·offset
  * within int32 for the int32 dimension keys up to factor ~200.
  */
object ScaleUp {

  private val keyCols: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey"),
    "nation"     -> Seq("n_nationkey", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_nationkey"),
    "supplier"   -> Seq("s_suppkey", "s_nationkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val Offset = 10000000L

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcDir> <outDir> <factor>")
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    val spark = graft.sessions.Sessions
      .builder(appName = "graft-scaleup", master = "local[32]",
        shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keyCols.foreach { case (table, ks) =>
      val df = spark.read.parquet(s"$src/$table.parquet")
      (0 until factor)
        .map { r =>
          ks.foldLeft(df) { (d, k) =>
            // cast back so int32 dimension keys keep their physical type
            d.withColumn(k,
              (col(k) + lit(r * Offset)).cast(df.schema(k).dataType))
          }
        }
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(s"scaled $table x$factor")
    }
    spark.stop()
  }
}
