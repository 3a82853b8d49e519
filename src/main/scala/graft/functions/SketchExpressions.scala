package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native sketch primitives over an array of 64-bit element hashes (the
  * output of `transform(shingles, xxhash64)`). Both replace HOF-lambda
  * folds that evaluate interpreted per element with primitive loops inside
  * whole-stage codegen — semantics are bit-identical to the HOF forms they
  * replaced (wrapping 64-bit arithmetic, same constants), only faster
  * (~2.5× on the sf0.1 dedup queries, where signature computation
  * dominates).
  */

/** MinHash signature: out[i] = min over h in hashes of (h*(2i+1) +
  * i*GOLDEN), for i < numPerm — the same 64 affine permutations as the
  * public splitmix64 mixing constant scheme in [[graft.operators.Dedup]]. */
case class MinHashSig(child: Expression, numPerm: Int)
    extends UnaryExpression {

  private val Golden = 0x9E3779B97F4A7C15L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires array<bigint>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](numPerm)
    var i = 0
    while (i < numPerm) {
      val a = 2L * i + 1
      val b = i * Golden
      var best = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = hs.getLong(j) * a + b
        if (v < best) best = v
        j += 1
      }
      out(i) = if (n == 0) Long.MaxValue else best
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val best = ctx.freshName("best")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |long[] $out = new long[$numPerm];
         |for (int $i = 0; $i < $numPerm; $i++) {
         |  long $a = 2L * $i + 1;
         |  long $b = $i * ${Golden}L;
         |  long $best = Long.MAX_VALUE;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $v = $c.getLong($j) * $a + $b;
         |    if ($v < $best) $best = $v;
         |  }
         |  $out[$i] = ($n == 0) ? Long.MAX_VALUE : $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash: per bit j, sum +1/-1 votes of bit j across all hashes;
  * output bit j is set iff the vote is positive — identical to the
  * zip_with/aggregate vote fold it replaces. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<bigint>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = hs.getLong(j)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int $n = $c.numElements();
         |int[] $votes = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  long $h = $c.getLong($j);
         |  for (int $i = 0; $i < 64; $i++) {
         |    if ((($h >>> $i) & 1L) == 1L) $votes[$i]++; else $votes[$i]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($votes[$i] > 0) $out |= (1L << $i);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Fused token-window sketches: tokens → per-window MD5 shingle hash →
  * minhash/simhash, in one pass with zero Spark-level string allocation.
  *
  * The shingle hash is an *engine-portable* md5 slice: the hash of window
  * `[tok_w .. tok_{w+n-1}]` is the first 8 bytes (16 hex chars) of
  * `md5("tok_w tok_{w+1} ... ")` — exactly the value any SQL engine can
  * derive as `('0x' || substr(md5(s), 1, 16))::UBIGINT`. That portability
  * is what makes the LSH dedup queries oracle-checkable: DuckDB reproduces
  * the signatures (and therefore the candidate sets) bit-for-bit, where a
  * Spark-internal hash (xxhash64/murmur3) has no DuckDB equivalent.
  *
  * Window multisets (not distinct sets) feed the sketch — duplicate
  * shingles cannot change a min and only reinforce simhash votes, while
  * the exact-Jaccard *verification* stage still uses true distinct shingle
  * sets. Heavy per-row loops amortize the CodegenFallback eval call; the
  * MD5 (~100 ns/shingle, one digest reused per row) is a few percent of
  * the sf0.1 query time.
  */
abstract class ShingleSketchBase extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  def n: Int
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle sketch requires array<string>, got $t")
    }

  /** 64-bit md5-slice hash of every n-token window: big-endian first 8
    * digest bytes of the space-joined shingle string's UTF-8 encoding. */
  protected final def shingleHashes(toks: ArrayData): Array[Long] = {
    val m = toks.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return Array.emptyLongArray
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](cnt)
    var w = 0
    while (w < cnt) {
      md.reset()
      var k = 0
      while (k < n) {
        if (k > 0) md.update(' '.toByte)
        val s = toks.getUTF8String(w + k)
        if (s != null) md.update(s.getBytes)
        k += 1
      }
      val d = md.digest()
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
      out(w) = h
      w += 1
    }
    out
  }
}

/** MinHash signature straight from the token array (see base doc).
  *
  * Permutation scheme over the prime field p = 2^31-1: the shingle value
  * is the top 32 bits of the md5 slice reduced mod p (DuckDB:
  * `('0x'||substr(md5(s),1,8))::UBIGINT % 2147483647`), and
  * sig[i] = min over shingles of ((2i+1)·h + (i+1)) mod p. Every quantity
  * stays below 2^38, so the arithmetic is exact—and identical—in any
  * engine with 64-bit integers; affine maps with p prime are bijections,
  * which is all banded LSH needs from its "permutations".
  *
  * Inputs with fewer than n tokens have NO shingles, hence no meaningful
  * signature — the expression returns NULL for them (nullable). Returning
  * a sentinel instead (the min over an empty set) would give every short
  * doc the identical all-MaxValue signature, colliding them in every LSH
  * band; NULL forces callers to decide (minhashLsh filters short docs
  * before sketching, and its DuckDB oracle mirrors the same guard). */
case class ShingleMinHash(child: Expression, n: Int, numPerm: Int)
    extends ShingleSketchBase {
  private val P31 = 2147483647L // 2^31 - 1, prime
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val th = shingleHashes(toks)
    if (th.isEmpty) return null
    val out = Array.fill(numPerm)(Long.MaxValue)
    var w = 0
    while (w < th.length) {
      val h = (th(w) >>> 32) % P31 // top 32 bits = first 8 hex chars
      var i = 0
      while (i < numPerm) {
        val v = ((2L * i + 1) * h + (i + 1)) % P31
        if (v < out(i)) out(i) = v
        i += 1
      }
      w += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

/** DISTINCT n-gram shingle STRINGS in one pass — the native form of
  * `array_distinct(transform(sequence(...), concat_ws(...)))`
  * ([[graft.operators.Dedup.shinglesOf]]), which evaluates a Catalyst HOF
  * tree per window and measurably dominates the string-domain dedup
  * queries (≈7 s of a 12 s sf0.1 run, see memory of the e8 rework).
  * Output SET is identical — same strings, first-occurrence order, empty
  * array (not null) below n tokens — so every oracle over the string
  * domain is unchanged; only the evaluation path differs. `concat_ws`
  * semantics mirrored: null tokens are skipped, separator only BETWEEN
  * appended parts. */
case class ShingleSet(child: Expression, n: Int)
    extends ShingleSketchBase {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val cnt = m - n + 1
    if (cnt <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val seen = new java.util.LinkedHashSet[org.apache.spark.unsafe.types.UTF8String]()
    val sb = new java.lang.StringBuilder(64)
    var w = 0
    while (w < cnt) {
      sb.setLength(0)
      var first = true
      var k = 0
      while (k < n) {
        val s = toks.getUTF8String(w + k)
        if (s != null) { // concat_ws skips nulls
          if (!first) sb.append(' ')
          sb.append(s.toString)
          first = false
        }
        k += 1
      }
      seen.add(org.apache.spark.unsafe.types.UTF8String.fromString(
        sb.toString)): Unit
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

/** SORTED DISTINCT array of the 64-bit md5-slice window hashes — the
  * hash-domain representation of a doc's shingle SET (e8 PPJoin front
  * end). Sorting inside the expression makes the canonical prefix order
  * a free `slice` downstream, and set semantics here keep the
  * verification `array_intersect` an exact set intersection. Returns an
  * empty array only for sub-n-token docs the callers filter anyway
  * (consistent with [[ShingleMinHash]]'s NULL, this returns null too). */
case class ShingleHashSet(child: Expression, n: Int)
    extends ShingleSketchBase {
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val th = shingleHashes(input.asInstanceOf[ArrayData])
    if (th.isEmpty) return null
    java.util.Arrays.sort(th)
    // in-place dedup of the sorted array
    var w = 1
    var i = 1
    while (i < th.length) {
      if (th(i) != th(i - 1)) { th(w) = th(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(th, w))
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashSet =
    copy(child = newChild)
}

/** 64-bit SimHash straight from the token array (see base doc): per bit j
  * of the full md5-slice hash, sum +1/-1 votes across shingles; output bit
  * j is set iff the vote is strictly positive (DuckDB mirror: bit set iff
  * `2*count(bit set) > count(shingles)`).
  *
  * As with [[ShingleMinHash]], a doc with fewer than n tokens has no
  * shingles and returns NULL rather than the degenerate all-zero-votes
  * hash 0L, which would collide every short doc in every pigeonhole
  * chunk (simhash callers filter size(toks) >= n before sketching). */
case class ShingleSimHash(child: Expression, n: Int)
    extends ShingleSketchBase {
  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val th = shingleHashes(toks)
    if (th.isEmpty) return null
    val votes = new Array[Int](64)
    var w = 0
    while (w < th.length) {
      val h = th(w)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      w += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSimHash =
    copy(child = newChild)
}

/** All hyperplane-LSH signatures of a double vector in one expression:
  * out[t] = bits of sign(<v, plane_{t,j}>) for each of `tables` tables of
  * `bits` planes. Replaces tables×bits separate DotProduct+when trees —
  * the expanded form generated ~100 sub-expressions whose whole-stage
  * codegen compile alone cost seconds per plan (see spark4 lesson in
  * project memory); here the planes are plain Scala state and the
  * generated work is a single fused loop nest. Eval-heavy per row, so
  * CodegenFallback's per-row call is amortized. */
case class HyperplaneSigs(child: Expression,
    planes: IndexedSeq[IndexedSeq[IndexedSeq[Double]]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  // Seq field gives structural case-class equality (Catalyst semanticEquals
  // / subexpression reuse see equal-content plane sets as equal); eval
  // walks primitive arrays
  @transient private lazy val planeArr: Array[Array[Array[Double]]] =
    planes.map(_.map(_.toArray).toArray).toArray

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_sigs requires array<double>, got $t")
    }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val out = new Array[Int](planeArr.length)
    var t = 0
    while (t < planeArr.length) {
      val table = planeArr(t)
      var sig = 0
      var j = 0
      while (j < table.length) {
        val p = table(j)
        val n = math.min(dim, p.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v.getDouble(i) * p(i); i += 1 }
        if (acc >= 0) sig |= (1 << j)
        j += 1
      }
      out(t) = sig
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
}

object SketchExpressions {
  def minhash_sig(hashes: Column, numPerm: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hashes), numPerm))
  def simhash64(hashes: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(hashes)))
  def shingle_minhash(toks: Column, n: Int, numPerm: Int): Column =
    ColumnBridge.column(
      ShingleMinHash(ColumnBridge.expression(toks), n, numPerm))
  def shingle_simhash(toks: Column, n: Int): Column =
    ColumnBridge.column(ShingleSimHash(ColumnBridge.expression(toks), n))
  def shingle_hash_set(toks: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashSet(ColumnBridge.expression(toks), n))
  def shingle_set(toks: Column, n: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(toks), n))
  def hyperplane_sigs(v: Column, planes: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(HyperplaneSigs(ColumnBridge.expression(v),
      planes.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq))
}
