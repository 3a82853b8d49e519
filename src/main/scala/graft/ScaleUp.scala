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

  /** Content fingerprint of a source corpus: md5 over each table file's
    * (name, size, mtime). Cheap (no data read) yet catches exactly the
    * failure mode round 7 hit — the driver refreshing `/root/testdata`
    * in place while a derived ×N replica (and the scale record measured
    * on it) silently went stale. */
  def fingerprint(src: String): String = {
    val parts = keyCols.keys.toSeq.sorted.map { t =>
      val f = new java.io.File(s"$src/$t.parquet")
      s"$t:${f.length}:${f.lastModified}"
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(parts.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  private def markerPath(out: String) = s"$out/_SCALE_SOURCE.json"

  /** True when `out` was generated from the CURRENT content of `src` at
    * this factor (per the marker its generation wrote). A missing or
    * unparseable marker is stale. */
  def isFresh(src: String, out: String, factor: Int): Boolean = {
    val m = new java.io.File(markerPath(out))
    m.exists && {
      val txt = new String(java.nio.file.Files.readAllBytes(m.toPath),
        "UTF-8")
      txt.contains(s""""source_fingerprint":"${fingerprint(src)}"""") &&
        txt.contains(s""""factor":$factor""")
    }
  }

  /** usage: ScaleUp <srcDir> <outDir> <factor> [--if-stale]
    * `--if-stale` makes regeneration conditional on the source-corpus
    * fingerprint: a replica generated from the current testdata content
    * is reused, anything else (including a driver-refreshed source) is
    * rebuilt. The marker travels with the replica, and Bench copies the
    * fingerprint into its JSON record so every scale measurement names
    * the corpus content it was taken against. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ScaleUp <srcDir> <outDir> <factor> [--if-stale]")
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    if (args.contains("--if-stale") && isFresh(src, out, factor)) {
      println(s"replica $out is fresh for $src x$factor — skipping")
      return
    }
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
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(markerPath(out)),
      s"""{"source":"$src","factor":$factor,""" +
        s""""source_fingerprint":"${fingerprint(src)}"}""")
    spark.stop()
  }
}
