package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** The EXPLICIT schema contract of the driver testdata, validated up
  * front by `Verify`/`Bench` so a corpus refresh that drifts a column
  * fails with ONE message naming the drifted table.column instead of
  * dozens of scattered analysis errors deep inside queries (the round-7
  * failure mode: `events.ts` silently changed physical encoding and 21
  * queries died of `DATATYPE_MISMATCH` individually).
  *
  * A column admits a SET of types where the corpus has legitimately
  * shipped more than one encoding — `events.ts` has been INT64
  * TIMESTAMP(NANOS) (scanned as LongType under nanosAsLong) and
  * timestamp[us] (scanned as TIMESTAMP_NTZ); both are normalized by
  * [[Sources.normalizeEventTs]]. Anything outside the set is drift the
  * engine has no repair for, and the right failure is immediate + named.
  *
  * Beyond schemas, the one DATA invariant queries depend on is
  * validated: `embeddings.vec_id` must be dense over 0..2·t·b−1 for the
  * relational hyperplane derivation (`Similarity.dataPlanes`) — checked
  * here for the largest (t,b) the registered queries use. */
object TestdataContract {

  private val Ntz: DataType = TimestampNTZType
  private val Ts: DataType = TimestampType
  private val eventTsTypes: Set[DataType] = Set(LongType, Ntz, Ts)

  /** table → (column → admissible scanned types). Order-insensitive;
    * extra columns are tolerated (widening is not drift), missing or
    * re-typed columns are not. */
  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region" -> Map("r_regionkey" -> Set(IntegerType),
      "r_name" -> Set(StringType)),
    "nation" -> Map("n_nationkey" -> Set(IntegerType),
      "n_name" -> Set(StringType), "n_regionkey" -> Set(IntegerType)),
    "customer" -> Map("c_custkey" -> Set(LongType),
      "c_name" -> Set(StringType), "c_nationkey" -> Set(IntegerType),
      "c_acctbal" -> Set(DoubleType), "c_mktsegment" -> Set(StringType)),
    "supplier" -> Map("s_suppkey" -> Set(LongType),
      "s_name" -> Set(StringType), "s_nationkey" -> Set(IntegerType),
      "s_acctbal" -> Set(DoubleType)),
    "part" -> Map("p_partkey" -> Set(LongType),
      "p_name" -> Set(StringType), "p_brand" -> Set(StringType),
      "p_type" -> Set(StringType), "p_size" -> Set(IntegerType),
      "p_retailprice" -> Set(DoubleType)),
    "orders" -> Map("o_orderkey" -> Set(LongType),
      "o_custkey" -> Set(LongType), "o_orderstatus" -> Set(StringType),
      "o_totalprice" -> Set(DoubleType),
      "o_orderdate" -> Set(Ntz, Ts, DateType, LongType),
      "o_orderpriority" -> Set(StringType)),
    "lineitem" -> Map("l_orderkey" -> Set(LongType),
      "l_partkey" -> Set(LongType), "l_suppkey" -> Set(LongType),
      "l_linenumber" -> Set(IntegerType),
      "l_quantity" -> Set(DoubleType),
      "l_extendedprice" -> Set(DoubleType),
      "l_discount" -> Set(DoubleType), "l_tax" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType),
      "l_linestatus" -> Set(StringType),
      "l_shipdate" -> Set(Ntz, Ts, DateType, LongType)),
    "events" -> Map("event_id" -> Set(LongType), "ts" -> eventTsTypes,
      "user_id" -> Set(LongType), "event_type" -> Set(StringType),
      "value" -> Set(DoubleType), "props" -> Set(StringType)),
    "documents" -> Map("doc_id" -> Set(LongType),
      "text" -> Set(StringType), "lang" -> Set(StringType),
      "source" -> Set(StringType), "n_chars" -> Set(LongType)),
    "embeddings" -> Map("vec_id" -> Set(LongType),
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false),
        ArrayType(DoubleType), ArrayType(DoubleType, false)),
      "label" -> Set(IntegerType))
  )

  /** Largest (tables·bits) product the registered LSH/hyperplane queries
    * derive planes for — vec_ids 0..2·t·b−1 must exist (Similarity
    * .dataPlanes): f2's lshTopK uses 16×6, e6's embeddingCosineLsh 8×12,
    * both products 96. Kept here so the contract fails BEFORE a long
    * verify run instead of inside the first e6/f2 query. */
  private val maxPlaneVecs = 2 * 96

  /** Validate every table under `sfDir`. Throws IllegalStateException
    * naming each drifted table.column (all drift in one message). */
  def validate(spark: SparkSession, sfDir: String): Unit = {
    val problems = scala.collection.mutable.ArrayBuffer.empty[String]
    expected.foreach { case (table, cols) =>
      val path = s"$sfDir/$table.parquet"
      if (!new java.io.File(path).exists())
        problems += s"$table: missing file $path"
      else {
        val got = spark.read.parquet(path).schema
          .map(f => f.name -> f.dataType).toMap
        cols.foreach { case (name, admissible) =>
          got.get(name) match {
            case None => problems += s"$table.$name: column missing " +
              s"(have: ${got.keys.toSeq.sorted.mkString(",")})"
            case Some(t)
              if !admissible.exists(a => sameModuloNullable(a, t)) =>
              problems += s"$table.$name: scanned type " +
                s"${t.simpleString} not in admissible " +
                s"{${admissible.map(_.simpleString).mkString(", ")}}"
            case _ => ()
          }
        }
      }
    }
    if (problems.isEmpty) {
      val n = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .filter(org.apache.spark.sql.functions.col("vec_id") <
          maxPlaneVecs)
        .select("vec_id").distinct().count()
      if (n < maxPlaneVecs)
        problems += s"embeddings.vec_id: not dense on 0..${maxPlaneVecs
          - 1} ($n of $maxPlaneVecs present) — Similarity.dataPlanes " +
          "cannot derive its hyperplanes relationally"
    }
    if (problems.nonEmpty)
      throw new IllegalStateException(
        s"testdata contract violated under $sfDir:\n  " +
          problems.mkString("\n  ") +
          "\n(fix: extend the affected operator's normalization — see " +
          "Sources.normalizeEventTs — or update TestdataContract if " +
          "the new encoding is intended)")
  }

  private def sameModuloNullable(a: DataType, b: DataType): Boolean =
    (a, b) match {
      case (x: ArrayType, y: ArrayType) =>
        sameModuloNullable(x.elementType, y.elementType)
      case _ => a == b
    }
}
