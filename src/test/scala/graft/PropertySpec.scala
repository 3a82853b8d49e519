package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.GraftFunctions
import graft.operators.Dedup

/** Property-based checks (ScalaCheck generators, batch-collected through
  * the live session to keep Spark job count bounded). */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val word: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
  val doc: Gen[String] = Gen.choose(1, 30)
    .flatMap(n => Gen.listOfN(n, word).map(_.mkString(" ")))

  test("rolling_hash: prefix composition h(ab)=(h(a)*131^|b|+h(b)) mod p") {
    import spark.implicits._
    val Mod = graft.functions.RollingHash.Mod
    // ASCII-only generator, so char count == UTF-8 byte count
    val pairs = Gen.listOfN(50, Gen.zip(doc, doc)).sample.get
    val rows = pairs.toDF("a", "b").select(
      GraftFunctions.rolling_hash(concat(col("a"), col("b"))).as("hab"),
      GraftFunctions.rolling_hash(col("a")).as("ha"),
      GraftFunctions.rolling_hash(col("b")).as("hb"),
      length(col("b")).as("lb")).collect()
    rows.foreach { r =>
      val pow = (0 until r.getInt(3))
        .foldLeft(1L)((p, _) => p * graft.functions.RollingHash.Base % Mod)
      assert(r.getLong(0) == (r.getLong(1) * pow + r.getLong(2)) % Mod)
    }
  }

  test("jaccard: range [0,1], symmetric, 1 iff identical shingle sets") {
    import spark.implicits._
    val docs = Gen.listOfN(40, doc).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text")
      .select(col("id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("id"), Dedup.shinglesOf(col("toks"), 2).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = df.select(col("id").as("ia"), col("sh").as("sa"))
    val b = df.select(col("id").as("ib"), col("sh").as("sb"))
    val rows = a.join(b)
      .select(col("ia"), col("ib"),
        Dedup.jaccard(col("sa"), col("sb")).as("jab"),
        Dedup.jaccard(col("sb"), col("sa")).as("jba"),
        (col("sa") === col("sb")).as("same"))
      .collect()
    rows.foreach { r =>
      val (jab, jba) = (r.getDouble(2), r.getDouble(3))
      assert(jab >= 0.0 && jab <= 1.0)
      assert(jab == jba)
      // 1 iff identical shingle sets (both directions)
      assert((jab == 1.0) == r.getBoolean(4))
      if (r.getLong(0) == r.getLong(1)) assert(jab == 1.0)
    }
  }

  test("simhash: hamming(a,b) <= 64, equal docs at 0, subadditive-ish via xor") {
    import spark.implicits._
    val docs = Gen.listOfN(30, doc).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("id", "text").select(col("id"),
      graft.functions.SketchExpressions
        .shingle_simhash(Dedup.tokens(col("text")), 2).as("s"))
    // sub-n-token docs are NULL under the sketch contract — drop them
    val hs = df.collect().flatMap(r =>
      Option(r.get(1)).map(v => r.getLong(0) -> v.asInstanceOf[Long])).toMap
    assert(hs.nonEmpty)
    for ((i, hi) <- hs; (j, hj) <- hs) {
      val d = java.lang.Long.bitCount(hi ^ hj)
      assert(d >= 0 && d <= 64)
      if (i == j) assert(d == 0)
    }
  }

  test("minhash: sigs in [0, p), identical docs identical, permutation-wise monotone") {
    import spark.implicits._
    val P31 = 2147483647L
    val docs = Gen.listOfN(30, doc).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    // duplicate every doc under a shifted id: identical token arrays must
    // produce identical signatures regardless of row position
    val all = docs ++ docs.map { case (i, t) => (i + 1000L, t) }
    val rows = all.toDF("id", "text")
      .select(col("id"), graft.functions.SketchExpressions
        .shingle_minhash(Dedup.tokens(col("text")), 2, 16).as("sig"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Long](1))).toMap
    rows.foreach { case (id, sig) =>
      sig match {
        case Some(s) =>
          assert(s.length == 16)
          // real minima live inside the prime field
          assert(s.forall(v => v >= 0 && v < P31))
        case None => // sub-n-token doc: NULL, never a sentinel signature
      }
      if (id < 1000L) assert(sig == rows(id + 1000L))
    }
    // the corpus generator must exercise both branches for this test to
    // mean anything
    assert(rows.values.exists(_.isDefined))
  }

  test("md5 winnow hashes are nonnegative (signed/unsigned min agree)") {
    import spark.implicits._
    val docs = Gen.listOfN(30, doc).sample.get.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val mins = docs.toDF("id", "text")
      .select(col("id"), Dedup.tokens(col("text")).as("toks"))
      .select(array_min(transform(Dedup.shinglesOf(col("toks"), 2),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long"))).as("m"))
      .collect().flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
    // 60-bit md5 slice: always fits positive in a signed long
    mins.foreach(m => assert(m >= 0L && m < (1L << 60)))
  }

  test("sorted_intersect_count == size(array_intersect) on sorted sets") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      def arr() = rng.shuffle((0L to 400L).toList)
        .take(rng.nextInt(60)).distinct.sorted
      (i.toLong, arr(), arr())
    }
    val df = rows.toDF("id", "a", "b")
    val bad = df.select(
        graft.functions.SortedIntersectCount
          .sorted_intersect_count(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(bad == 0)
    // codegen and interpreted paths agree (CodegenObjectFactoryMode spans
    // both in practice; force the interpreted eval explicitly)
    rows.foreach { case (_, a, b) =>
      val e = graft.functions.SortedIntersectCount(
        org.apache.spark.sql.catalyst.expressions.Literal.create(a,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, false)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(b,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, false)))
      assert(e.eval(null) == a.toSet.intersect(b.toSet).size)
    }
  }

  test("kmv sketch: partitioning-invariant merges, sorted-distinct, capped") {
    import spark.implicits._
    val df = (1L to 5000L).map(_ % 997).toDF("v")
    def sk(parts: Int): Seq[Long] = df.repartition(parts)
      .agg(graft.functions.KMinValues.kmv_sketch(col("v"), 64).as("s"))
      .collect()(0).getSeq[Long](0)
    val one = sk(1)
    val many = sk(13)
    // partition-order independence = merge correctness
    assert(one == many)
    assert(many.length == 64)
    assert(many == many.sorted.distinct)
    // values are 0..996, so the 64 distinct minima are exactly 0..63
    assert(many == (0L until 64L).toSeq)
  }

  test("dot product: bilinear in scalar multiples, matches BigDecimal-free fold") {
    import spark.implicits._
    val vecs = Gen.listOfN(20,
      Gen.listOfN(16, Gen.choose(-5.0, 5.0))).sample.get
    val rows = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
      .select(col("id"), col("v"),
        graft.functions.DotProduct
          .dot_product(col("v"), col("v")).as("selfdot"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](1)
      var expect = 0.0
      v.foreach(x => expect += x * x)
      assert(r.getDouble(2) == expect) // bit-exact sequential fold
      assert(r.getDouble(2) >= 0.0)
    }
  }
}
