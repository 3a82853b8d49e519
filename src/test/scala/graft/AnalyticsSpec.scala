package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Profile, StarJoin, Windows}

/** j8 cube / j9 window analytics / g17 profiler / e11 semantic dedup. */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ----------------------------------------------------- g23 pack-split

  test("pack-with-split: every non-final bin carries exactly the budget") {
    val out = graft.operators.TextAnalysis
      .sequencePackSplit(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val lastBin = out.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    // the zero-waste invariant a whole-doc packer cannot give: every
    // bin except each language's final one is EXACTLY 512 tokens
    out.filter { case (l, s, _, _, _) => s < lastBin(l) }.foreach {
      case (l, s, _, _, tok) =>
        assert(tok == 512L, s"bin ($l, $s) carries $tok tokens")
    }
    // token conservation: bins partition the corpus exactly
    val packed = out.map(_._5).sum
    val corpus = spark.read
      .parquet(s"${TestSpark.sf}/documents.parquet")
      .select(sum(size(split(lower(col("text")), " "))))
      .head.getLong(0)
    assert(packed == corpus, s"packed $packed vs corpus $corpus tokens")
    // fragments ≥ whole docs per bin; a doc spanning k bins appears in
    // each — whole-doc count never exceeds fragment count
    out.foreach { case (l, s, frags, whole, _) =>
      assert(whole <= frags, s"bin ($l, $s): $whole whole > $frags frags")
    }
  }

  // ------------------------------------------------ g24 budget selection

  test("token-budget selection: within budget, maximal, quality-barred") {
    val rows = graft.operators.TextAnalysis
      .tokenBudgetSelect(spark, TestSpark.sf, budget = 2000L).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (avail, tokAvail, sel, tokSel) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(tokSel <= 2000L, s"budget exceeded: $r")
      assert(sel <= avail && tokSel <= tokAvail)
      // maximality at the aggregate level: either everything fit, or
      // the selection is non-trivially bounded by the budget (the
      // exact next-doc maximality is pinned by the driver oracle's
      // full replay)
      assert(sel == avail || tokSel > 0L, s"empty bounded selection: $r")
      if (sel > 0) assert(!r.isNullAt(5), s"quality bar missing: $r")
    }
  }

  // ---------------------------------------- packer scale-shape plan pin

  test("packers run the distributed prefix sum, never a per-group window") {
    CacheScope.withScope {
      val dfs = Seq(
        "g16" -> graft.operators.TextAnalysis
          .sequencePack(spark, TestSpark.sf),
        "g23" -> graft.operators.TextAnalysis
          .sequencePackSplit(spark, TestSpark.sf),
        "g24" -> graft.operators.TextAnalysis
          .tokenBudgetSelect(spark, TestSpark.sf))
      dfs.foreach { case (name, df) =>
        val bad = TestSpark.unboundedGroupWindows(df)
        assert(bad.isEmpty,
          s"$name funnels each group through one window task on: $bad")
        // the distributed form IS present: a running-sum window keyed by
        // (partition id, group) — bounded by the range-partition size
        val twoKey = df.queryExecution.optimizedPlan.collect {
          case w: org.apache.spark.sql.catalyst.plans.logical.Window
              if w.partitionSpec.size >= 2 => w
        }
        assert(twoKey.nonEmpty,
          s"$name lost its partition-local running-sum window")
      }
    }
  }

  // ------------------------------------------ g25 source cap / g26 CMS

  test("source cap: two-level top-N equals the plain per-source window") {
    import org.apache.spark.sql.expressions.Window
    val capped = graft.operators.TextAnalysis
      .sourceCap(spark, TestSpark.sf, cap = 5, salts = 4)
    // reference: the single-window form over the SAME quality scores
    // (extracted from the capped frame's own lineage-free recompute)
    val scored = graft.operators.TextAnalysis
      .sourceCap(spark, TestSpark.sf, cap = Int.MaxValue, salts = 1)
      .select(col("source"), col("doc_id"), col("quality_score"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    val reference = scored.withColumn("src_rank", row_number().over(w))
      .filter(col("src_rank") <= 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = capped.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(3))).toSet
    assert(got.map(t => (t._1, t._2)) == reference,
      "two-level selection must equal the single-window top-N")
    // ranks are exactly 1..min(cap, n_source_docs) per source
    got.groupBy(_._1).foreach { case (src, rows) =>
      assert(rows.map(_._3).toSeq.sorted == (1 to rows.size),
        s"$src ranks not dense")
      assert(rows.size <= 5, s"$src over cap")
    }
    // plan pin: the corpus-sized window is the TWO-key salted one; the
    // per-source exact window runs only above the stage-1 cap filter
    // (≤ salts × cap rows per source by construction)
    val windows = capped.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    val salted = windows.filter(_.partitionSpec.size >= 2)
    val exact = windows.filter(_.partitionSpec.size < 2)
    assert(salted.nonEmpty, "stage-1 salted window missing")
    assert(exact.forall(_.child.exists {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.toString.contains("_r1") ||
          f.condition.toString.contains("row_number")
      case _ => false
    }), "per-source window must run above the stage-1 cap filter only")
  }

  test("CMS: estimates over-count only, and shard sketches merge by addition") {
    val out = graft.operators.TextAnalysis
      .cmsTokenFrequency(spark, TestSpark.sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getLong(3) >= 0L, s"CMS under-counted: $r")
      assert(r.getLong(2) >= r.getLong(1), s"estimate < exact: $r")
    }
    // corpus-wide invariant, not just the head: every token's estimate
    // (min over its row buckets) bounds its exact count from above
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val tokens = docs.select(
      explode(Dedup.tokens(col("text"))).as("token"))
    val cells = graft.operators.TextAnalysis.cmsCells(tokens, 4, 512)
    val exact = tokens.groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
    val probes = exact.select(col("token"), col("n"),
      posexplode(graft.operators.TextAnalysis.cmsBuckets(4, 512))
        .as(Seq("r", "b")))
    val under = probes.join(cells, Seq("r", "b"))
      .groupBy(col("token"), col("n"))
      .agg(min(col("c")).as("est"))
      .filter(col("est") < col("n")).count()
    assert(under == 0L, "a CMS estimate under-counted somewhere")
    // mergeability: cells(corpus) == cells(even docs) + cells(odd docs)
    def toksOf(half: org.apache.spark.sql.DataFrame) =
      half.select(explode(Dedup.tokens(col("text"))).as("token"))
    val even = graft.operators.TextAnalysis
      .cmsCells(toksOf(docs.filter(col("doc_id") % 2 === 0)), 4, 512)
    val odd = graft.operators.TextAnalysis
      .cmsCells(toksOf(docs.filter(col("doc_id") % 2 === 1)), 4, 512)
    val merged = even.unionByName(odd)
      .groupBy(col("r"), col("b")).agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val whole = cells.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole,
      "shard sketches must merge to the corpus sketch by cell addition")
  }

  test("incremental CMS: deleting everything folds every cell to zero") {
    import graft.sources.GraftLog
    val root = graft.sources.Staging.tempDir("graft_cms_spec_")
    val (src, cells) = (s"$root/src", s"$root/cells")
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(col("doc_id"), col("text")).limit(50)
    GraftLog.overwrite(docs, src)
    graft.operators.TextAnalysis.cmsMaintain(spark, src, cells, 4, 64)
    assert(graft.operators.TextAnalysis.cmsRead(spark, cells).count() > 0)
    GraftLog.delete(spark, src, lit(true))
    graft.operators.TextAnalysis.cmsMaintain(spark, src, cells, 4, 64)
    assert(graft.operators.TextAnalysis.cmsRead(spark, cells).count()
      == 0, "a fully-deleted corpus must leave an all-zero sketch")
  }

  // ------------------------------------------------------------- j8 cube

  test("cube = rollup + nation-only supergroups; grand total matches j1") {
    val cube = StarJoin.revenueCube(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4)))
    val rollup = StarJoin.revenueRollup(spark, TestSpark.sf).count()
    val nations = cube.count(_._3 == 2) // gid=2: nation kept, region nulled
    assert(cube.length == rollup + nations)
    // exactly one grand-total row (gid = 3)
    assert(cube.count(_._3 == 3) == 1)
    // every nation-only supergroup is a real nation from the detail level
    val detailNations = cube.filter(_._3 == 0).map(_._2).toSet
    assert(cube.filter(_._3 == 2).map(_._2).toSet == detailNations)
  }

  test("cube grand total equals the flat aggregate") {
    val cube = StarJoin.revenueCube(spark, TestSpark.sf)
    val total = cube.filter(col("gid") === 3)
      .select(col("total_revenue")).collect().head.getDouble(0)
    val flat = StarJoin.revenueByNation(spark, TestSpark.sf)
      .agg(round(sum(col("total_revenue")).cast("double"), 6))
      .collect().head.getDouble(0)
    assert(math.abs(total - flat) < 1e-4, s"cube=$total flat=$flat")
  }

  // ---------------------------------------------------------- j9 windows

  test("window returns: first-day NULL, day_idx dense, ma7 bounded") {
    val out = Windows.dailyReturns(spark, TestSpark.sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val byTicker = rows.groupBy(_.getString(1))
    byTicker.foreach { case (t, rs) =>
      val sorted = rs.sortBy(_.getInt(5)) // day_idx
      // dense 1..n per ticker
      assert(sorted.map(_.getInt(5)).toSeq == (1 to rs.length))
      // first day has no previous close
      assert(sorted.head.isNullAt(3), s"ticker $t first return not null")
      // every later day has a return
      assert(sorted.tail.forall(!_.isNullAt(3)))
    }
    // ma7 of the first row is the close itself
    rows.filter(_.getInt(5) == 1).foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(4)) < 1e-6)
    }
  }

  test("window returns: one exchange for the agg, one for the windows") {
    val q = Windows.dailyReturns(spark, TestSpark.sf)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    // groupBy (trade_date, ticker) + window repartition on ticker; the
    // three window specs share the ticker partitioning (no third shuffle)
    assert(exchanges <= 2, s"expected <=2 exchanges, plan:\n$plan")
  }

  test("vol_rank: rank 1 is the max-volume day per ticker") {
    val daily = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "lineitem")
      .groupBy(to_date(col("l_shipdate")).as("trade_date"),
        col("l_returnflag").as("ticker"))
      .agg(sum(col("l_quantity").cast("decimal(38,10)")).as("vol"))
    val expect = daily.groupBy(col("ticker"))
      .agg(max(col("vol")).as("maxv"))
    val got = Windows.dailyReturns(spark, TestSpark.sf)
      .filter(col("vol_rank") === 1)
      .join(daily, Seq("trade_date", "ticker"))
      .join(expect, Seq("ticker"))
    assert(got.filter(col("vol") =!= col("maxv")).count() == 0)
  }

  // --------------------------------------------------------- g17 profile

  test("profiler: one row per column, exact metrics on customer") {
    val df = graft.sources.Sources.testTable(spark, TestSpark.sf, "customer")
    val n = df.count()
    val prof = Profile.exactProfile(df).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(prof.size == df.schema.fields.length)
    val key = prof("c_custkey")
    assert(key.getLong(2) == n)          // n_rows
    assert(key.getLong(3) == 0)          // n_nulls
    assert(key.getLong(4) == n)          // key is unique
    val expectMin = df.agg(min(col("c_custkey"))).collect().head.getLong(0)
    assert(key.getDouble(5) == expectMin.toDouble) // min c_custkey
    val name = prof("c_name")
    assert(name.getString(1) == "string")
    assert(name.getDouble(9) > 0)        // avg_len
    assert(name.isNullAt(5) && name.isNullAt(6)) // no numeric range
  }

  test("profiler: single scan (expand-based multi-distinct, no re-reads)") {
    val df = graft.sources.Sources.testTable(spark, TestSpark.sf, "customer")
    val q = Profile.exactProfile(df)
    q.count()
    val plan = q.queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan, plan:\n$plan")
    assert(plan.contains("Expand"), "multi-distinct should plan via Expand")
  }

  // ---------------------------------------------------- e11 semantic dedup

  test("semantic dedup with one cluster equals the exact-cosine keeper set") {
    // nCent=1 puts every vector in the same cell, so SemDeDup degenerates
    // to the min-id keeper aggregation over ALL cos>=tau pairs — exactly
    // the e5 pair list grouped by the dropped side
    val sem = Dedup.semanticDedup(spark, TestSpark.sf, nCent = 1, tau = 0.4)
      .select(col("vec_id"), col("keeper_id"), col("keeper_cosine"))
    val expect = Dedup.embeddingCosine(spark, TestSpark.sf,
        threshold = 0.4, maxVecId = Long.MaxValue)
      .groupBy(col("vec_b").as("vec_id"))
      .agg(min(col("vec_a")).as("keeper_id"),
        round(min_by(col("cosine"), col("vec_a")), 6).as("keeper_cosine"))
    assert(sem.exceptAll(expect).count() == 0)
    assert(expect.exceptAll(sem).count() == 0)
    assert(sem.count() > 0)
  }

  // ------------------------------------------------- j10 exact percentiles

  test("revenue percentiles: ordered, bounded, day counts exact") {
    val out = Windows.dailyPercentiles(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (p50, p90) = (r.getDouble(2), r.getDouble(3))
      val (mn, mx) = (r.getDouble(4), r.getDouble(5))
      assert(mn <= p50 && p50 <= p90 && p90 <= mx,
        s"percentile ordering broken for ${r.getString(0)}")
    }
    val days = Windows.dailyReturns(spark, TestSpark.sf)
      .groupBy(col("ticker")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(r.getLong(1) == days(r.getString(0))))
  }

  // --------------------------------------------------- g18 bigram LM score

  test("bigram LM score: (0,1] bounded, bigram counts exact per doc") {
    val out = graft.operators.TextAnalysis
      .bigramLmScore(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1.0))
    val docs = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), size(split(lower(col("text")), " "))
        .as("n_toks"))
      .filter(col("n_toks") >= 2).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.length == docs.size)
    out.foreach(r => assert(r.getLong(1) == docs(r.getLong(0)) - 1L))
  }

  // -------------------------------------------------- g19 DSIR importance

  test("DSIR importance: target language scores above the rest") {
    val out = graft.operators.TextAnalysis
      .dsirScore(spark, TestSpark.sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out.nonEmpty)
    assert(out.values.forall(_._1 > 0))
    // selected is exactly the >= 1 gate on the emitted score
    assert(out.values.forall { case (s, sel) => sel == (s >= 1.0) })
    val langs = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def meanOf(p: String => Boolean): Double = {
      val xs = out.collect { case (id, (s, _)) if p(langs(id)) => s }
      xs.sum / xs.size
    }
    val enMean = meanOf(_ == "en")
    val restMean = meanOf(_ != "en")
    info(f"DSIR mean score: en=$enMean%.4f rest=$restMean%.4f")
    // the whole point of importance weighting: target-language docs'
    // hashed-bigram profiles must score visibly above the rest
    assert(enMean > restMean,
      s"target mean $enMean should exceed non-target $restMean")
  }

  // ---------------------------------------------- e12 edit-distance dedup

  test("edit-distance dedup: subset of simhash pairs, verifier exact") {
    val e12 = Dedup.editDistanceDedup(spark, TestSpark.sf).collect()
    val e4 = Dedup.simhash(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e12.nonEmpty, "corpus has planted near-dups; expected pairs")
    assert(e12.forall(r => e4.contains((r.getLong(0), r.getLong(1)))))
    // length-relative bound holds on every surviving pair
    assert(e12.forall(_.getDouble(4) <= 0.25))
    // re-verify one pair's edit distance independently
    val docs = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "documents")
    val r0 = e12.head
    val t = docs.filter(col("doc_id").isin(r0.getLong(0), r0.getLong(1)))
      .orderBy(col("doc_id")).collect().map(_.getAs[String]("text"))
    val redo = spark.range(1)
      .select(levenshtein(lit(t(0)), lit(t(1))).cast("long"))
      .collect().head.getLong(0)
    assert(redo == r0.getLong(3))
  }

  // ------------------------------------------------- e13 containment dedup

  test("containment: bounded, directional, dominates Jaccard pairwise") {
    val c13 = Dedup.containment(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c13.nonEmpty)
    assert(c13.values.forall(v => v > 0 && v <= 1.0))
    // containment(a→b) >= jaccard(a,b): |∩|/|A| >= |∩|/|A∪B|
    val jac = Dedup.ngramJaccardFull(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    jac.foreach { case ((a, b), j) =>
      c13.get((a, b)).foreach(c => assert(c >= j - 1e-9,
        s"containment $c < jaccard $j for ($a,$b)"))
    }
  }

  test("bucketed containment (e14) recalls every e13 pair, value-equal") {
    // The prefix filter is deterministic, so e14's recall vs the exact
    // form is not probabilistic: every e13 pair at the same threshold
    // must be present with the same (hash-domain) containment value —
    // the e3-vs-e7 pattern, but with set containment instead of Jaccard.
    val exact = Dedup.containment(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bucketed = Dedup.containmentBucketed(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(bucketed.nonEmpty)
    exact.foreach { case (pair, c) =>
      val b = bucketed.get(pair)
      assert(b.isDefined, s"e14 missed e13 pair $pair (recall violation)")
      // string-domain vs 64-bit hash-domain shingle sets agree unless a
      // hash collision fuses shingles — none on this corpus
      assert(math.abs(b.get - c) < 1e-9,
        s"$pair: e14 ${b.get} != e13 $c")
    }
    // and nothing below threshold leaks out
    assert(bucketed.values.forall(v => v >= 0.5 - 1e-9 && v <= 1.0 + 1e-9))
  }

  // ------------------------------------------------------ d5 SQL surface

  test("CREATE TABLE USING graft: catalog SQL equals the direct filter") {
    val q = graft.operators.Ddl.graftSqlTable(spark, TestSpark.sf)
    val expect = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "customer")
      .filter(col("c_custkey").between(201, 500))
    assert(q.exceptAll(expect).count() == 0 &&
      expect.exceptAll(q).count() == 0)
  }

  test("SQL MERGE INTO a graft table equals the API merge") {
    val viaSql = graft.operators.Ddl.graftSqlMerge(spark, TestSpark.sf)
    val viaApi = graft.operators.Transactions.mergedV1(spark, TestSpark.sf)
    assert(viaSql.exceptAll(viaApi).count() == 0 &&
      viaApi.exceptAll(viaSql).count() == 0)
  }

  test("SQL MERGE NOT MATCHED BY SOURCE DELETE: SCD close-out semantics") {
    val q = graft.operators.Ddl.graftSqlMergeScd(spark, TestSpark.sf)
    val cust = graft.sources.Sources
      .testTable(spark, TestSpark.sf, "customer")
    val expect = cust.filter(col("c_custkey") % 3 =!= 0)
      .withColumn("c_acctbal", col("c_acctbal") + 1000.0)
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
    assert(q.exceptAll(expect).count() == 0 &&
      expect.exceptAll(q).count() == 0)
    // re-running the whole statement is idempotent (absolute source)
    val again = graft.operators.Ddl.graftSqlMergeScd(spark, TestSpark.sf)
    assert(again.exceptAll(expect).count() == 0 &&
      expect.exceptAll(again).count() == 0)
  }

  test("SQL UPDATE + DELETE on a graft table: file-pruned, correct rows") {
    import graft.sources.{GraftLog, Sources, Staging}
    val d = Staging.tempDir("graft_dmlspec_") + "/cust"
    val cust = Sources.testTable(spark, TestSpark.sf, "customer")
      .repartitionByRange(6, col("c_custkey"))
    GraftLog.overwrite(cust, d)
    val before = GraftLog.snapshot(spark, d)._1.toSet
    spark.sql("DROP TABLE IF EXISTS dml_spec_t")
    spark.sql(s"CREATE TABLE dml_spec_t USING graft OPTIONS (path '$d')")
    spark.sql(
      """UPDATE dml_spec_t SET c_acctbal = 0.0
        |WHERE c_custkey <= 10""".stripMargin)
    // pruning: only the file(s) holding keys <= 10 were rewritten
    val afterUpdate = GraftLog.snapshot(spark, d)._1.toSet
    assert((before -- afterUpdate).size < before.size,
      "UPDATE must not rewrite every file")
    spark.sql("DELETE FROM dml_spec_t WHERE c_custkey > 140")
    val back = spark.table("dml_spec_t")
    val expect = cust
      .withColumn("c_acctbal",
        when(col("c_custkey") <= 10, 0.0).otherwise(col("c_acctbal")))
      .filter(col("c_custkey") <= 140)
    assert(back.exceptAll(expect).count() == 0 &&
      expect.exceptAll(back).count() == 0)
    // history: every statement is one commit, time travel intact
    assert(GraftLog.versions(spark, d) == Seq(0L, 1L, 2L))
    assert(GraftLog.readVersion(spark, d, 0L).count() == cust.count())
  }

  test("SQL OPTIMIZE/VACUUM/ZORDER parse and act; other SQL untouched") {
    import graft.sources.{GraftLog, Sources, Staging}
    val d = Staging.tempDir("graft_maint_") + "/cust"
    val cust = Sources.testTable(spark, TestSpark.sf, "customer")
    (0 until 3).foreach(i =>
      GraftLog.append(cust.filter(col("c_custkey") % 3 === i), d))
    // path-literal form
    spark.sql(s"OPTIMIZE '$d' FILES 2")
    assert(GraftLog.snapshot(spark, d)._1.size == 2)
    spark.sql(s"VACUUM '$d' RETAIN 1 VERSIONS")
    assert(GraftLog.versions(spark, d).size == 1)
    val back = GraftLog.read(spark, d)
    assert(back.exceptAll(cust).count() == 0 &&
      cust.exceptAll(back).count() == 0)
    // ZORDER form routes to clusterBy (layout-only)
    spark.sql(s"OPTIMIZE '$d' FILES 4 ZORDER BY (c_custkey, c_acctbal)")
    assert(GraftLog.read(spark, d).count() == cust.count())
    // the delegating parser leaves ordinary SQL to Spark verbatim
    assert(spark.sql("SELECT 1 + 1 AS two").collect().head.getInt(0) == 2)
    intercept[Exception] { spark.sql("OPTIMIZE") } // malformed → Spark err
  }

  test("3-column ZORDER: rows identical, stats prune on every column") {
    import graft.sources.{GraftLog, Sources, Staging}
    val d = Staging.tempDir("graft_z3_") + "/cust"
    val cust = Sources.testTable(spark, TestSpark.sf, "customer")
    GraftLog.overwrite(cust, d)
    spark.sql(
      s"OPTIMIZE '$d' FILES 8 ZORDER BY " +
        "(c_custkey, c_acctbal, c_nationkey)")
    val back = GraftLog.read(spark, d)
    assert(back.exceptAll(cust).count() == 0 &&
      cust.exceptAll(back).count() == 0)
    // a narrow range on EACH clustered column opens fewer files than
    // the live set — the 3-dim layout keeps every dimension's per-file
    // stats tight
    val nFiles = GraftLog.snapshot(spark, d)._1.size
    assert(nFiles >= 4)
    Seq(("c_custkey", 1.0, 50.0), ("c_acctbal", -999.0, 0.0),
      ("c_nationkey", 0.0, 2.0)).foreach { case (c, lo, hi) =>
      val pruned = GraftLog.prunedFiles(spark, d, c, lo, hi).size
      assert(pruned < nFiles,
        s"$c range [$lo,$hi] should prune: $pruned of $nFiles")
    }
    // 5-column form refused loudly
    val e = intercept[Exception] {
      spark.sql(s"OPTIMIZE '$d' ZORDER BY (c_custkey, c_acctbal, " +
        "c_nationkey, c_name, c_mktsegment)")
    }
    assert(e.getMessage.contains("2-4"))
  }

  test("SQL VACUUM RETAIN n HOURS: wide window keeps all, zero keeps live") {
    import graft.sources.{GraftLog, Sources, Staging}
    val d = Staging.tempDir("graft_exph_") + "/cust"
    val cust = Sources.testTable(spark, TestSpark.sf, "customer")
    (0 until 3).foreach(i =>
      GraftLog.append(cust.filter(col("c_custkey") % 3 === i), d))
    // a generous window retains every version (no-op)
    spark.sql(s"VACUUM '$d' RETAIN 1000 HOURS")
    assert(GraftLog.versions(spark, d).size == 3)
    // zero window: only the live snapshot survives, rows intact
    Thread.sleep(5)
    spark.sql(s"VACUUM '$d' RETAIN 0 HOURS")
    assert(GraftLog.versions(spark, d).size == 1)
    val back = GraftLog.read(spark, d)
    assert(back.exceptAll(cust).count() == 0 &&
      cust.exceptAll(back).count() == 0)
  }

  test("SQL RESTORE TABLE … TO VERSION AS OF rewinds and stays travelable") {
    import graft.sources.{GraftLog, Sources, Staging}
    val d = Staging.tempDir("graft_rest_") + "/cust"
    val cust = Sources.testTable(spark, TestSpark.sf, "customer")
    val early = cust.filter(col("c_custkey") <= 50)
    val nEarly = early.count()
    GraftLog.overwrite(early, d)                                 // v0
    GraftLog.append(cust.filter(col("c_custkey") > 50), d)       // v1
    spark.sql(s"RESTORE TABLE '$d' TO VERSION AS OF 0")          // v2
    assert(GraftLog.read(spark, d).count() == nEarly)
    // history intact: the pre-restore snapshot stays addressable
    assert(GraftLog.readVersion(spark, d, 1L).count() == cust.count())
    assert(GraftLog.versions(spark, d) == Seq(0L, 1L, 2L))
    // catalog-table form + cache invalidation after the command
    spark.sql("DROP TABLE IF EXISTS rest_t")
    spark.sql(s"CREATE TABLE rest_t USING graft OPTIONS (path '$d')")
    try {
      assert(spark.table("rest_t").count() == nEarly)
      spark.sql("RESTORE TABLE rest_t TO VERSION AS OF 1")
      assert(spark.table("rest_t").count() == cust.count())
      // TIMESTAMP AS OF form: v0's commit instant resolves to v0
      val ts0 = GraftLog.history(spark, d).collect()
        .find(_.getLong(0) == 0L).get.getTimestamp(4)
      val lit = ts0.toInstant.atZone(java.time.ZoneOffset.UTC)
        .toLocalDateTime.toString
      spark.sql(s"RESTORE TABLE rest_t TO TIMESTAMP AS OF '$lit'")
      assert(spark.table("rest_t").count() == nEarly)
    } finally spark.sql("DROP TABLE rest_t")
  }

  test("SQL DESCRIBE DETAIL / VACUUM DRY RUN / FSCK REPAIR TABLE") {
    import graft.sources.{GraftLog, Sources, Staging}
    val d = Staging.tempDir("graft_det_") + "/cust"
    val cust = Sources.testTable(spark, TestSpark.sf, "customer")
    GraftLog.overwrite(cust.filter(col("c_custkey") <= 50)
      .coalesce(1), d)                                           // v0
    GraftLog.append(cust.filter(col("c_custkey") > 50)
      .coalesce(1), d)                                           // v1
    // DESCRIBE DETAIL: one row, commit-logged sizes, live counts
    val det = spark.sql(s"DESCRIBE DETAIL '$d'").collect()
    assert(det.length == 1)
    val r = det.head
    assert(r.getString(0) == "graft" && r.getLong(2) == 1L &&
      r.getLong(3) == 2L && r.getLong(5) == 0L)
    val diskBytes = GraftLog.snapshot(spark, d)._1
      .map(f => new java.io.File(s"$d/$f").length).sum
    assert(r.getLong(4) == diskBytes)
    // VACUUM DRY RUN: v0-only files listed, NOTHING deleted
    GraftLog.overwrite(cust.coalesce(1), d)                      // v2
    val plan = spark.sql(s"VACUUM '$d' RETAIN 1 VERSIONS DRY RUN")
      .collect().map(_.getString(0))
    // the listing mirrors the sweep exactly: the two v0/v1 part files
    // plus their _SUCCESS markers (which the sweep also deletes)
    assert(plan.count(_.endsWith(".parquet")) == 2, plan.mkString(","))
    assert(GraftLog.versions(spark, d) == Seq(0L, 1L, 2L)) // untouched
    plan.foreach(p => assert(new java.io.File(s"$d/$p").exists))
    // FSCK: delete a backing file externally; DRY RUN lists it,
    // repair drops the entry and reads work again
    val victim = GraftLog.snapshot(spark, d)._1.head
    assert(new java.io.File(s"$d/$victim").delete())
    val dry = spark.sql(s"FSCK REPAIR TABLE '$d' DRY RUN")
      .collect().map(_.getString(0))
    assert(dry.toSeq == Seq(victim))
    intercept[Exception] { GraftLog.read(spark, d).count() }
    val fixed = spark.sql(s"FSCK REPAIR TABLE '$d'")
      .collect().map(_.getString(0))
    assert(fixed.toSeq == Seq(victim))
    assert(GraftLog.read(spark, d).count() == 0) // the one live file died
    assert(GraftLog.history(spark, d).collect()
      .head.getString(1) == "fsck")
    // a healthy table audits clean
    assert(spark.sql(s"FSCK REPAIR TABLE '$d' DRY RUN").count() == 0)
  }

  test("SQL SHALLOW CLONE TIMESTAMP AS OF pins the historical snapshot") {
    import graft.sources.{GraftLog, Sources, Staging}
    val root = Staging.tempDir("graft_clts_")
    val (src, dst) = (s"$root/src", s"$root/dst")
    val cust = Sources.testTable(spark, TestSpark.sf, "customer")
    GraftLog.overwrite(cust.filter(col("c_custkey") <= 50), src)  // v0
    Thread.sleep(5)
    GraftLog.append(cust.filter(col("c_custkey") > 50), src)      // v1
    // an instant between v0 and v1 resolves (at-or-before) to v0
    val ts0 = GraftLog.history(spark, src).collect()
      .find(_.getLong(0) == 0L).get.getTimestamp(4)
    val lit = ts0.toInstant.atZone(java.time.ZoneOffset.UTC)
      .toLocalDateTime.toString
    spark.sql(s"CREATE TABLE '$dst' SHALLOW CLONE '$src' " +
      s"TIMESTAMP AS OF '$lit'")
    assert(GraftLog.read(spark, dst).count() ==
      cust.filter(col("c_custkey") <= 50).count())
  }

  test("SQL OPTIMIZE of a non-graft catalog table falls through to Spark") {
    spark.sql("DROP TABLE IF EXISTS maint_pq_t")
    spark.sql("CREATE TABLE maint_pq_t (id INT) USING parquet")
    try {
      // the target resolves to a parquet-provider table, so the graft
      // parser must NOT capture it — a co-installed extension (Delta)
      // would otherwise lose its own OPTIMIZE surface. With no such
      // extension installed here, the delegate's parse error surfaces,
      // not graft's "not a USING graft table" failure.
      val e = intercept[Exception] { spark.sql("OPTIMIZE maint_pq_t") }
      assert(!e.getMessage.contains("USING graft"), e.getMessage)
    } finally spark.sql("DROP TABLE maint_pq_t")
  }

  test("SQL VERSION AS OF / TIMESTAMP AS OF / DESCRIBE HISTORY") {
    import graft.sources.{GraftLog, Sources, Staging}
    val d = Staging.tempDir("graft_tt_") + "/cust"
    val cust = Sources.testTable(spark, TestSpark.sf, "customer")
    val early = cust.filter(col("c_custkey") <= 50)
    GraftLog.overwrite(early, d)                            // v0
    GraftLog.append(cust.filter(col("c_custkey") > 50), d)  // v1
    spark.sql("DROP TABLE IF EXISTS tt_t")
    spark.sql(s"CREATE TABLE tt_t USING graft OPTIONS (path '$d')")
    try {
      assert(spark.sql("SELECT count(*) AS n FROM tt_t VERSION AS OF 0")
        .head.getLong(0) == early.count())
      assert(spark.sql("SELECT count(*) AS n FROM tt_t VERSION AS OF 1")
        .head.getLong(0) == cust.count())
      // two travel clauses compose in one query (self-join at versions)
      assert(spark.sql(
        """SELECT count(*) AS n
          |FROM tt_t VERSION AS OF 1 a JOIN tt_t VERSION AS OF 0 b
          |  ON a.c_custkey = b.c_custkey""".stripMargin)
        .head.getLong(0) == early.count())
      // TIMESTAMP AS OF: a future instant resolves to the latest
      // version; one before the first commit is a clear error
      assert(spark.sql(
        "SELECT count(*) AS n FROM tt_t TIMESTAMP AS OF '2099-01-01'")
        .head.getLong(0) == cust.count())
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM tt_t TIMESTAMP AS OF '1999-01-01'")
          .collect()
      }
      assert(e.getMessage.contains("at or before"), e.getMessage)
      // DESCRIBE HISTORY: one row per commit, newest first
      val h = spark.sql("DESCRIBE HISTORY tt_t").collect()
      assert(h.map(_.getLong(0)).toSeq == Seq(1L, 0L))
      assert(h.map(_.getString(1)).toSeq == Seq("append", "overwrite"))
      // a non-graft relation with time travel is left for Spark to
      // reject (we must not swallow it)
      intercept[Exception] {
        spark.sql("SELECT * FROM maint_absent_t VERSION AS OF 3").collect()
      }
    } finally spark.sql("DROP TABLE tt_t")
  }

  test("SQL ALTER COLUMN TYPE widens a catalog graft table in place") {
    import graft.sources.{GraftLog, Staging}
    import org.apache.spark.sql.types.LongType
    val d = Staging.tempDir("graft_widen_sql_") + "/t"
    GraftLog.overwrite(spark.range(8)
      .select(col("id").cast("int").as("id"),
        concat(lit("v"), col("id")).as("tag")), d)
    spark.sql("DROP TABLE IF EXISTS widen_sql_t")
    spark.sql(s"CREATE TABLE widen_sql_t USING graft OPTIONS (path '$d')")
    try {
      spark.sql("ALTER TABLE widen_sql_t ALTER COLUMN id TYPE bigint")
      // catalog schema re-pointed (RefreshAfterDml), wide rows land
      assert(spark.table("widen_sql_t").schema("id").dataType == LongType)
      spark.sql(
        "INSERT INTO widen_sql_t VALUES (CAST(7000000000 AS BIGINT), 'big')")
      assert(spark.table("widen_sql_t")
        .agg(max(col("id"))).collect().head.getLong(0) == 7000000000L)
      assert(spark.table("widen_sql_t").count() == 9)
      // a non-widening SQL alter refuses
      intercept[Exception] {
        spark.sql("ALTER TABLE widen_sql_t ALTER COLUMN id TYPE int")
      }
    } finally spark.sql("DROP TABLE widen_sql_t")
  }

  test("unsupported SQL DML shapes fail loudly, not wrongly") {
    import graft.sources.{GraftLog, Sources, Staging}
    val d = Staging.tempDir("graft_dmlspec_") + "/cust_strict"
    GraftLog.overwrite(
      Sources.testTable(spark, TestSpark.sf, "customer"), d)
    spark.sql("DROP TABLE IF EXISTS dml_strict_t")
    spark.sql(s"CREATE TABLE dml_strict_t USING graft OPTIONS (path '$d')")
    Sources.testTable(spark, TestSpark.sf, "customer").limit(5)
      .createOrReplaceTempView("dml_strict_src")
    // non-equi merge condition is not routed
    intercept[UnsupportedOperationException] {
      spark.sql(
        """MERGE INTO dml_strict_t t USING dml_strict_src s
          |ON t.c_custkey < s.c_custkey
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    }
  }

  test("column stats flip a selective dim-fact join to broadcast (CBO)") {
    import graft.sources.{GraftLog, Sources, Staging}
    val root = Staging.tempDir("graft_cbo_")
    val (dimD, factD) = (s"$root/dim", s"$root/fact")
    GraftLog.overwrite(
      Sources.testTable(spark, TestSpark.sf, "customer"), dimD)
    GraftLog.overwrite(
      Sources.testTable(spark, TestSpark.sf, "orders"), factD)
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
    spark.sql("DROP TABLE IF EXISTS cbo_fact")
    spark.sql(s"CREATE TABLE cbo_dim USING graft OPTIONS (path '$dimD')")
    spark.sql(s"CREATE TABLE cbo_fact USING graft OPTIONS (path '$factD')")
    val dimBytes = GraftLog.fileSizes(spark, dimD).values.sum
    val maxKey = spark.table("cbo_dim")
      .agg(max(col("c_custkey"))).collect().head.getLong(0)
    // threshold sits just UNDER the dim's size: the unfiltered dim can
    // never broadcast, a selective filter's CBO estimate can
    def planOf(): String = {
      // d.* keeps the projection from shrinking the no-stats size
      // estimate below the threshold on its own
      spark.sql(
        s"""SELECT f.o_orderkey, d.* FROM cbo_fact f
           |JOIN cbo_dim d ON f.o_custkey = d.c_custkey
           |WHERE d.c_custkey <= ${maxKey / 20}""".stripMargin)
        .queryExecution.executedPlan.toString
    }
    val olds = Seq("spark.sql.cbo.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (dimBytes - 1).toString)
      val before = planOf()
      assert(before.contains("SortMergeJoin"),
        s"without stats the filtered dim keeps its full size estimate " +
          s"and must not broadcast:\n${before.take(1500)}")
      spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR COLUMNS " +
        "c_custkey").collect()
      spark.catalog.refreshTable("cbo_dim")
      val after = planOf()
      assert(after.contains("BroadcastHashJoin"),
        s"with ndv/min/max stats the CBO filter estimate shrinks the " +
          s"dim below the threshold:\n${after.take(1500)}")
    } finally {
      olds.foreach { case (k, v) => v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      } }
      spark.sql("DROP TABLE cbo_dim")
      spark.sql("DROP TABLE cbo_fact")
    }
  }

  test("plain ANALYZE after FOR COLUMNS keeps the column CBO stats") {
    import graft.sources.{GraftLog, Sources, Staging}
    val root = Staging.tempDir("graft_cbo_keep_")
    GraftLog.overwrite(
      Sources.testTable(spark, TestSpark.sf, "region"), s"$root/t")
    spark.sql("DROP TABLE IF EXISTS cbo_keep_t")
    spark.sql(
      s"CREATE TABLE cbo_keep_t USING graft OPTIONS (path '$root/t')")
    try {
      // backquoted column list must parse (quote-aware splitter)
      spark.sql("ANALYZE TABLE cbo_keep_t COMPUTE STATISTICS FOR " +
        "COLUMNS `r_regionkey`, r_name").collect()
      def colStats() = spark.sessionState.catalog
        .getTableMetadata(spark.sessionState.sqlParser
          .parseTableIdentifier("cbo_keep_t"))
        .stats.map(_.colStats).getOrElse(Map.empty)
      val before = colStats()
      assert(before.contains("r_regionkey") && before.contains("r_name"),
        s"FOR COLUMNS must land column stats: ${before.keySet}")
      // a later table-level ANALYZE must carry them forward, not wipe
      spark.sql("ANALYZE TABLE cbo_keep_t COMPUTE STATISTICS").collect()
      val after = colStats()
      assert(after.contains("r_regionkey") && after.contains("r_name"),
        s"plain ANALYZE wiped column stats: ${after.keySet}")
      // a partial FOR COLUMNS pass keeps the other column's stats too
      spark.sql("ANALYZE TABLE cbo_keep_t COMPUTE STATISTICS FOR " +
        "COLUMNS r_name").collect()
      val merged = colStats()
      assert(merged.contains("r_regionkey") && merged.contains("r_name"),
        s"partial FOR COLUMNS wiped earlier columns: ${merged.keySet}")
    } finally spark.sql("DROP TABLE cbo_keep_t")
  }

  test("stats staleness guard: drift triggers incremental refresh, broadcast survives") {
    import graft.sources.{GraftLog, Sources, Staging}
    val root = Staging.tempDir("graft_cbo_stale_")
    val (dimD, factD) = (s"$root/dim", s"$root/fact")
    GraftLog.overwrite(
      Sources.testTable(spark, TestSpark.sf, "customer"), dimD)
    GraftLog.overwrite(
      Sources.testTable(spark, TestSpark.sf, "orders"), factD)
    spark.sql("DROP TABLE IF EXISTS cbo_stale_dim")
    spark.sql("DROP TABLE IF EXISTS cbo_stale_fact")
    spark.sql(
      s"CREATE TABLE cbo_stale_dim USING graft OPTIONS (path '$dimD')")
    spark.sql(
      s"CREATE TABLE cbo_stale_fact USING graft OPTIONS (path '$factD')")
    val dimBytes = GraftLog.fileSizes(spark, dimD).values.sum
    val n0 = spark.table("cbo_stale_dim").count()
    val maxKey = spark.table("cbo_stale_dim")
      .agg(max(col("c_custkey"))).collect().head.getLong(0)
    def planOf(): String = spark.sql(
      s"""SELECT f.o_orderkey, d.* FROM cbo_stale_fact f
         |JOIN cbo_stale_dim d ON f.o_custkey = d.c_custkey
         |WHERE d.c_custkey <= ${maxKey / 20}""".stripMargin)
      .queryExecution.executedPlan.toString
    def catStats() = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser
        .parseTableIdentifier("cbo_stale_dim")).stats
    val olds = Seq("spark.sql.cbo.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (dimBytes - 1).toString)
      spark.sql("ANALYZE TABLE cbo_stale_dim COMPUTE STATISTICS FOR " +
        "COLUMNS c_custkey").collect()
      spark.catalog.refreshTable("cbo_stale_dim")
      assert(planOf().contains("BroadcastHashJoin"),
        "fresh column stats must flip the filtered dim to broadcast")
      // the dim TRIPLES: two shifted copies merged in via SQL (the
      // RefreshAfterDml path, where the staleness guard runs)
      Sources.testTable(spark, TestSpark.sf, "customer")
        .withColumn("c_custkey", col("c_custkey") + 10000000L)
        .unionByName(Sources.testTable(spark, TestSpark.sf, "customer")
          .withColumn("c_custkey", col("c_custkey") + 20000000L))
        .createOrReplaceTempView("cbo_stale_src")
      spark.sql(
        """MERGE INTO cbo_stale_dim t USING cbo_stale_src s
          |ON t.c_custkey = s.c_custkey
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // guard fired: stats refreshed INCREMENTALLY (not dropped) —
      // exact rowCount/nullCount + live-file min/max from metadata,
      // ndv by KMV merge over only the new files
      val st = catStats().getOrElse(fail("catalog stats entry missing"))
      assert(st.rowCount.exists(_.toLong == 3 * n0),
        s"rowCount must be re-folded from the log: ${st.rowCount}")
      val cs = st.colStats.getOrElse("c_custkey",
        fail(s"column stats must SURVIVE drift via incremental " +
          s"refresh: ${st.colStats.keySet}"))
      val ndv = cs.distinctCount.get.toLong
      assert(ndv > 2 * n0 && ndv <= 4 * n0,
        s"refreshed ndv must see the tripled key space: $ndv vs n0=$n0")
      assert(cs.max.exists(_.toLong >= 20000000L),
        s"refreshed max must cover the shifted keys: ${cs.max}")
      // the re-plan broadcasts off the HONEST refreshed estimate: the
      // filtered dim really is small (the filter selects the original
      // key range, a sliver of the tripled domain)
      val after = planOf()
      assert(after.contains("BroadcastHashJoin"),
        s"post-refresh plan must broadcast off honest column stats:\n" +
          after.take(1500))
      // a SECOND drift wave (2x the staleness horizon): the refresh is
      // rolling — stats keep pace commit after commit, bounded by new
      // data since the LAST refresh, never re-scanning the table
      Sources.testTable(spark, TestSpark.sf, "customer")
        .withColumn("c_custkey", col("c_custkey") + 30000000L)
        .unionByName(Sources.testTable(spark, TestSpark.sf, "customer")
          .withColumn("c_custkey", col("c_custkey") + 40000000L))
        .createOrReplaceTempView("cbo_stale_src2")
      spark.sql(
        """MERGE INTO cbo_stale_dim t USING cbo_stale_src2 s
          |ON t.c_custkey = s.c_custkey
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val st2 = catStats().getOrElse(fail("stats entry missing"))
      assert(st2.rowCount.exists(_.toLong == 5 * n0),
        s"second wave rowCount: ${st2.rowCount}")
      val cs2 = st2.colStats.getOrElse("c_custkey",
        fail("column stats must survive the second wave too"))
      assert(cs2.distinctCount.get.toLong > 4 * n0,
        s"ndv must keep pace: ${cs2.distinctCount}")
      assert(cs2.max.exists(_.toLong >= 40000000L), s"max: ${cs2.max}")
      assert(planOf().contains("BroadcastHashJoin"),
        "the broadcast flip must survive unbounded append drift")
    } finally {
      olds.foreach { case (k, v) => v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      } }
      spark.sql("DROP TABLE cbo_stale_dim")
      spark.sql("DROP TABLE cbo_stale_fact")
    }
  }

  test("j13 star: DPP + Bloom skip + pushed filter in ONE executed plan") {
    import graft.operators.Joins
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val df = Joins.starComposed(spark, TestSpark.sf)
    def all(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => all(a.executedPlan)
      case q: QueryStageExec => all(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(all)
    }
    // plan-shape asserts read the INITIAL plan (AQE's finalized print
    // re-renders the already-evaluated DPP filter without the marker)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"DPP subquery missing from the star plan:\n${plan.take(2000)}")
    df.collect()
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"both dims must ride as broadcasts:\n${plan.take(2000)}")
    assert(plan.contains("EqualTo(c_mktsegment,BUILDING)"),
      s"segment filter must reach the parquet scan as a PushedFilter:" +
        s"\n${plan.take(2000)}")
    // Bloom skipping: the orders scan opens strictly fewer files than
    // the table holds (string point predicate — min/max can't prune)
    val ordsScans = all(df.queryExecution.executedPlan).filter(
      _.relation.location.rootPaths.exists(_.toString
        .contains("graft_star_")))
    assert(ordsScans.nonEmpty, "star plan must scan the orders table")
    val ordsDir = Joins.starOrders(spark, TestSpark.sf)
    val total = graft.sources.GraftLog.snapshot(spark, ordsDir)._1.size
    val scanned = ordsScans.map(_.metrics("numFiles").value).sum
    assert(scanned < total,
      s"Bloom bitmaps must skip files: scanned $scanned of $total")
  }

  test("j13 catalog twin: column stats flip the UNHINTED customer leg " +
      "to broadcast while DPP stays in the same plan") {
    import graft.operators.Joins
    import graft.sources.{GraftLog, Sources, Staging}
    val factDir = Joins.dppFact(spark, TestSpark.sf)
    val ordsDir = Joins.starOrders(spark, TestSpark.sf)
    val custD = Staging.tempDir("graft_cbo_star_") + "/cust"
    GraftLog.overwrite(
      Sources.testTable(spark, TestSpark.sf, "customer"), custD)
    spark.sql("DROP TABLE IF EXISTS cbo_star_cust")
    spark.sql(
      s"CREATE TABLE cbo_star_cust USING graft OPTIONS (path '$custD')")
    val dimBytes = GraftLog.fileSizes(spark, custD).values.sum
    def planOf(): String = {
      val fact = spark.read.format("graft").load(factDir)
      val flags = Sources.testTable(spark, TestSpark.sf, "lineitem")
        .select(col("l_returnflag").as("flag")).distinct()
        .withColumn("flag_name", concat(lit("FLAG_"), col("flag")))
        .filter(col("flag_name") === "FLAG_R")
      val ords = graft.sources.GraftFileIndex.read(spark, ordsDir)
        .filter(col("o_orderpriority") === "1-URGENT")
      // ALL customer columns stay in the OUTPUT: column pruning would
      // otherwise shrink the no-stats size estimate under the
      // threshold on its own (d20-test discipline)
      val cust = spark.table("cbo_star_cust")
        .filter(col("c_mktsegment") === "BUILDING")
      val custCols = spark.table("cbo_star_cust").columns.toSeq
      fact.join(broadcast(flags), col("l_returnflag") === col("flag"))
        .join(ords, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey")) // NO hint
        .select((Seq("flag", "o_orderpriority") ++ custCols).map(col): _*)
        .queryExecution.executedPlan.toString
    }
    val olds = Seq("spark.sql.cbo.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (dimBytes - 1).toString)
      val before = planOf()
      assert(before.contains("SortMergeJoin"),
        s"without stats the filtered customer keeps its full size and " +
          s"must not broadcast:\n${before.take(1500)}")
      val bhjBefore = "BroadcastHashJoin".r.findAllIn(before).length
      spark.sql("ANALYZE TABLE cbo_star_cust COMPUTE STATISTICS FOR " +
        "COLUMNS c_custkey, c_mktsegment").collect()
      spark.catalog.refreshTable("cbo_star_cust")
      val after = planOf()
      assert("BroadcastHashJoin".r.findAllIn(after).length > bhjBefore,
        s"ndv(c_mktsegment) must shrink the filtered dim under the " +
          s"threshold → one MORE broadcast than the stats-less plan:" +
          s"\n${after.take(1500)}")
      // plan print truncates long scan lines ("dynamicpruningexpressio…")
      // — match the subquery marker, which never truncates
      assert(after.toLowerCase.contains("dynamicpruning"),
        "DPP and the CBO broadcast flip must coexist in ONE plan:\n" +
          after.take(1500))
    } finally {
      olds.foreach { case (k, v) => v match {
        case Some(x) => spark.conf.set(k, x)
        case None => spark.conf.unset(k)
      } }
      spark.sql("DROP TABLE cbo_star_cust")
    }
  }

  test("semantic dedup: keeper precedes dropped, pairs share a cluster") {
    val out = Dedup.semanticDedup(spark, TestSpark.sf).collect()
    assert(out.forall(r => r.getLong(2) < r.getLong(1))) // keeper < dropped
    assert(out.forall(r => r.getDouble(3) >= 0.4))
    // clustered variant can only find a subset of the all-pairs variant
    val all = Dedup.semanticDedup(spark, TestSpark.sf, nCent = 1).count()
    assert(out.length <= all)
  }
}
