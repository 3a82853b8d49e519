package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial (Karp-Rabin-style) rolling hash of
  * a string's UTF-8 bytes — h = Σ ubyte[i]·131^(n-1-i) mod 1_000_000_007.
  * The document-fingerprinting primitive (SURVEY.md §7.6): equal normalized
  * texts ⇒ equal fingerprints, and prefix hashes compose
  * (h(ab) = (h(a)·131^|b| + h(b)) mod p), which is what makes
  * window/winnowing schemes cheap at scale.
  *
  * Mod-p (not wrapping-64-bit) on purpose: h < p and 131·p + 255 < 2^38,
  * so every intermediate is exact in plain 64-bit integers and the value
  * is reproducible in ANY engine — DuckDB's oracle recomputes it as a
  * `list_reduce` over the hex-expanded UTF-8 bytes, where wrapping 64-bit
  * products would overflow-error instead. Bytes are taken unsigned
  * (0..255) for the same reason.
  *
  * Implemented with real `doGenCode` (not CodegenFallback) so it stays
  * inside whole-stage codegen: the generated loop runs over the UTF8String
  * byte array with zero boxing or JVM↔interpreter transitions — the same
  * reason the engine prefers built-in `functions._` over UDFs everywhere
  * else.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires a string argument, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * RollingHash.Base + (bytes(i) & 0xFFL)) % RollingHash.Mod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long ${ev.value}_h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  ${ev.value}_h = (${ev.value}_h * ${RollingHash.Base}L
         |    + ($bytes[$i] & 0xFFL)) % ${RollingHash.Mod}L;
         |}
         |${ev.value} = ${ev.value}_h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Base = 131L
  val Mod = 1000000007L
}

object GraftFunctions {
  /** Column-API form (Spark 4: Column↔Expression bridge lives in
    * classic.ExpressionUtils). */
  def rolling_hash(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))

  private def litInt(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

  /** Register every graft native expression for SQL use in this session:
    * rolling_hash(str), dot_product(arr, arr), minhash_sig(arr<bigint>, k),
    * simhash64(arr<bigint>), shingle_minhash(arr<string>, n, k),
    * shingle_simhash(arr<string>, n). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction(
      "rolling_hash", exprs => RollingHash(exprs.head), "scala_udf")
    r.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    r.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => MinHashSig(exprs(0), litInt(exprs(1))), "scala_udf")
    r.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
    r.createOrReplaceTempFunction(
      "shingle_minhash",
      exprs => ShingleMinHash(exprs(0), litInt(exprs(1)), litInt(exprs(2))),
      "scala_udf")
    r.createOrReplaceTempFunction(
      "shingle_simhash",
      exprs => ShingleSimHash(exprs(0), litInt(exprs(1))), "scala_udf")
    r.createOrReplaceTempFunction(
      "shingle_hash_set",
      exprs => ShingleHashSet(exprs(0), litInt(exprs(1))), "scala_udf")
    r.createOrReplaceTempFunction(
      "shingle_set",
      exprs => ShingleSet(exprs(0), litInt(exprs(1))), "scala_udf")
  }
}
