package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, AttributeSet, Cast, Divide, EqualTo, EvalMode, Expression, Greatest, GreaterThan, If, IsNotNull, IsNull, Literal, Multiply, NamedExpression, RaiseError, Sqrt, Subtract}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, StddevSamp, Sum, VarianceSamp}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.sources.{GraftFileIndex, GraftLog}

/** Materialized-view auto-rewrite — the planner half of the
  * incremental-view-maintenance pair ([[graft.operators.AggView]] is
  * the maintenance half). Delta/BigQuery/StarRocks users get this for
  * free: a query that re-aggregates the FACT table is silently served
  * from the maintained rollup when (and only when) the rollup is
  * current. The reference's silver→gold chain
  * (`mage_demo/custom/financial_dl_etl.py:85-94`) recomputes exactly
  * this shape from scratch each run; at 100 TB the rewrite turns that
  * full-lake scan into a groups-sized view read.
  *
  * Soundness gates, all checked per candidate aggregate:
  *   - the scanned path is a REGISTERED view source;
  *   - the scan is at the LATEST snapshot: a `versionAsOf`/
  *     `timestampAsOf` read anchored anywhere else keeps its base plan
  *     (the view folds CURRENT state — serving it to a time-traveled
  *     query would be a wrong historical answer);
  *   - the view is FRESH: its maintenance ledger high-water equals the
  *     source's latest commit version (one small-JSON read each). A
  *     stale view silently falls back to the base-table plan — a
  *     wrong-but-fast answer is never acceptable;
  *   - scan-side WHERE predicates reference VIEW group columns only
  *     (they select whole view-granularity buckets, so the per-bucket
  *     rows answer them identically — carried onto the view scan
  *     attribute-substituted; the filter column need not appear in the
  *     query's own GROUP BY when the view is maintained at
  *     (group, filter-column) granularity; any other column refuses:
  *     the rollup cannot answer it);
  *   - the aggregate decomposes over the view's delta log: grouping on
  *     a SUBSET of the view's group columns (a strict subset
  *     re-aggregates the finer buckets — every served aggregate folds
  *     additively over delta rows), aggregates limited to
  *     `count(1)` (→ `sum(d_count)`), the exact-decimal
  *     `sum(cast(value as decimal(38,10)))` (→ `sum(d_value)`), its
  *     `avg` twin (→ Average's own sum/count divide over the folded
  *     exact sums — bit-identical), and `stddev_samp`/`var_samp` of
  *     the value column via the exact second moment when the view
  *     maintains `d_sumsq` — with
  *     arbitrary scalar wrappers above the aggregate (round/cast carry
  *     over verbatim). The decimal cast must wrap the value column
  *     DIRECTLY (a nested truncating cast changes the base answer and
  *     refuses). A FLOAT sum is deliberately NOT rewritten: the view
  *     folds in exact decimal, and "the rewrite changed my
  *     floating-point sum" is a correctness bug, not a win; stddev is
  *     the one float exception because the base op's own answer is
  *     partition-order-dependent — the rewrite serves the
  *     deterministic two-pass moment value within that tolerance.
  *
  * Groups whose running d_count reaches 0 exist in the delta log but
  * not in the base table — the rewritten plan filters them with a
  * hidden `sum(d_count) > 0` aggregate, preserving result-set equality
  * under deletes. Output attribute ids are preserved, so parent plan
  * nodes resolve against the rewritten aggregate unchanged. */
object MvRegistry {

  /** One registered rollup: `view` maintains `groupCol` →
    * (count, exact sum of `valueCol`) over its source, stamped by
    * `appId` in the maintenance ledger. `key` is the source's row
    * identity (the CDF diff key); with `compensate = true` a STALE
    * view still serves — the rewrite unions the view's delta log with
    * freshly-derived deltas from the source's CDF tail
    * (ledger-high-water, latest], so the answer is always CURRENT at
    * O(changes) extra cost instead of falling back to the full fact
    * scan. */
  /** `unionOf`: non-empty for a UNION-MV — ONE view maintained over
    * several fact tables (each source folds under its own ledger app
    * id). The union rewrite requires the query's union children to be
    * exactly this source set. */
  final case class MvDef(view: String, groupCols: Seq[String],
      valueCol: String, appId: String, key: String = "",
      compensate: Boolean = false, unionOf: Seq[String] = Nil)

  private val bySrc =
    new scala.collection.concurrent.TrieMap[String, MvDef]

  /** Scheme-normalized key: a catalog table's resolved location is
    * URI-qualified (`file:/tmp/...`) while registrations usually carry
    * the bare path — both must hit the same entry. */
  private def norm(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  def register(src: String, d: MvDef): Unit = {
    bySrc.put(norm(src), d): Unit
  }
  def normPath(p: String): String = norm(p)
  /** The per-source ledger app id a UNION-MV folds each fact under —
    * shared by maintenance and the rewrite's freshness gate. */
  def unionAppId(base: String, src: String): String =
    base + "@" + norm(src)
  def unregister(src: String): Unit = { bySrc.remove(norm(src)): Unit }

  /** Lifecycle invalidation: drop every registration whose SOURCE or
    * VIEW path is `path`. DROP TABLE and RESTORE call this — a
    * dangling registration would otherwise let the next CREATE at the
    * same path rewrite against a stale MvDef (the freshness gate reads
    * the view's ledger, which a recreated view may satisfy again with
    * unrelated contents). */
  def unregisterMatching(path: String): Unit = {
    val p = norm(path)
    bySrc.filter { case (s, d) => s == p || norm(d.view) == p }
      .keys.foreach(k => bySrc.remove(k): Unit)
  }
  def clear(): Unit = bySrc.clear()
  def isEmpty: Boolean = bySrc.isEmpty
  def lookup(src: String): Option[MvDef] = bySrc.get(norm(src))
}

object GraftMvRewriteRule {
  /** Test seam for the freshness race: runs between the source-version
    * read and the view snapshot pin — the widest window in which a
    * concurrent maintenance commit can land. Production no-op. */
  private[graft] var raceSeam: () => Unit = () => ()
}

/** The session-extension-injected rule. Post-hoc resolution placement:
  * the aggregate is fully resolved, and the substituted plan re-enters
  * the remaining analysis batches like any other resolved tree. */
class GraftMvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvRegistry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate =>
        tryRewrite(agg).orElse(tryRewriteJoin(agg))
          .orElse(tryRewriteUnion(agg)).getOrElse(agg)
    }

  /** The source path scanned by `plan` — plus the snapshot version it
    * is anchored at and any Filters met on the way down — when it is
    * (modulo aliases, pure-attribute projections, and filters) one
    * graft relation. The asOf travels with the path because two
    * GraftFileIndexes over the same rootPaths are NOT interchangeable:
    * a `versionAsOf`/`timestampAsOf` scan reads a HISTORICAL snapshot,
    * and serving it from the CURRENT view state would be a wrong
    * historical answer. Filters are collected, not skipped — the
    * caller rewrites only when every one references group columns
    * exclusively (a group-column predicate selects whole GROUPS, so
    * applying it to the view's rows is the identical answer; any
    * other column cannot be answered from the rollup and refuses). */
  private def scannedGraftPath(plan: LogicalPlan)
      : Option[(String, Option[Long], Seq[Expression])] =
    plan match {
      case SubqueryAlias(_, child) => scannedGraftPath(child)
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        scannedGraftPath(child)
      case Filter(cond, child) =>
        scannedGraftPath(child).map { case (p, v, fs) =>
          (p, v, cond +: fs) }
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location match {
          case g: GraftFileIndex =>
            g.rootPaths.headOption.map(p =>
              (p.toString, g.asOfVersion, Seq.empty[Expression]))
          case _ => None
        }
      case _ => None
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = for {
    (src, asOf, filters) <- scannedGraftPath(agg.child)
    // a union-MV source never serves a SINGLE-table aggregate: its
    // view folds the OTHER sources' rows too (the freshness gate's
    // per-source app ids would also refuse, but the soundness must
    // not hinge on a ledger-key mismatch)
    d <- MvRegistry.lookup(src).filter(_.unionOf.isEmpty)
    // grouping: a SUBSET of the view's group columns (any order). An
    // exact match reads the view's granularity verbatim; a strict
    // subset RE-AGGREGATES the finer per-(view-group) delta rows —
    // sound because every served aggregate (count/sum/avg and the
    // moments) decomposes additively over delta rows however finely
    // they are bucketed. This is what lets a (group, filter-column)
    // view answer both the rollup query and the filtered dashboard
    // query below.
    gs <- {
      val attrs = agg.groupingExpressions.collect {
        case a: AttributeReference => a }
      // nonEmpty: a GLOBAL aggregate always returns one row even over
      // an empty table, but the rewritten plan's liveness filter
      // (sum(d_count) > 0) would drop it after a full delete — refuse
      if (attrs.nonEmpty &&
          attrs.length == agg.groupingExpressions.length &&
          attrs.map(_.name.toLowerCase).distinct.length == attrs.length &&
          attrs.forall(a =>
            d.groupCols.exists(_.equalsIgnoreCase(a.name))))
        Some(attrs) else None
    }
    // every scan-side filter must reference VIEW group columns ONLY:
    // such a predicate selects whole view-granularity buckets, so
    // evaluating it on the per-bucket delta rows gives the identical
    // answer (including NULL semantics — a NULL-bucket row fails the
    // predicate on both sides). The filter column need NOT appear in
    // the query's own GROUP BY — the dashboard shape `WHERE f = 'x'
    // GROUP BY g` serves from a (g, f) view. Any other reference means
    // the rollup cannot answer it — refuse.
    // It must also be DETERMINISTIC: a reference-free non-deterministic
    // leaf (e.g. `g = 'x' AND rand() < 0.5`) passes the reference check
    // vacuously but evaluates once per DELTA-LOG row instead of once
    // per fact row — different semantics, refuse.
    _ <- {
      if (filters.forall(f => f.deterministic &&
        f.references.forall(a =>
          d.groupCols.exists(_.equalsIgnoreCase(a.name)))))
        Some(()) else None
    }
    child <- deltaSource(d, src, asOf)
    rewritten <- build(agg, d, gs, child, filters)
  } yield rewritten

  /** The JOIN-MV rewrite (eager aggregation — Yan & Larson's
    * "aggregate pushdown below join", the single-table-MV join serving
    * StarRocks/BigQuery ship): an aggregate over
    * `fact ⋈_inner dim ON fact.k = dim.k GROUP BY dim.attr` is served
    * from a view maintained at fact-JOIN-KEY granularity — the
    * rewritten plan joins the groups-sized view to the dim subtree
    * (kept verbatim) and re-aggregates, never scanning the fact table.
    *
    * Soundness: the view carries one signed delta row set per fact
    * key; the inner equi-join replicates each of them once per
    * matching dim row — exactly the multiplicity every FACT row with
    * that key would see — so folded counts/sums/second-moments equal
    * the base plan's, a NULL key joins to nothing on both sides, and
    * extrema are replication-invariant. Fully-deleted fact keys still
    * carry net-zero delta rows through the join: they add zero to
    * every sum, and a group consisting ONLY of zombie keys folds its
    * hidden count to 0 and is dropped by the liveness filter — but an
    * aggregate over a DIM column (which zombie replication WOULD
    * corrupt) refuses, as does any non-decomposable aggregate.
    *
    * Gates on top of the single-table ones: INNER (or fact-preserved
    * OUTER — see validate()) equi-join whose every fact-touching
    * conjunct pairs a fact view-group column with a dim column;
    * grouping and join-level filters reference dim columns or fact
    * view-group columns only; exactly one side is a registered fact
    * scan. */
  private def tryRewriteJoin(agg: Aggregate): Option[LogicalPlan] = {
    def unwrap(p: LogicalPlan, fs: Seq[Expression])
        : Option[(Join, Seq[Expression])] = p match {
      case SubqueryAlias(_, c) => unwrap(c, fs)
      case Project(ps, c)
          if ps.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(c, fs)
      case Filter(cond, c) => unwrap(c, cond +: fs)
      case j: Join => Some((j, fs))
      case _ => None
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    unwrap(agg.child, Seq.empty).flatMap { case (jn, above) =>
      rewriteJoin(agg, jn, above, conjuncts) }
  }

  private def rewriteJoin(agg: Aggregate, jn: Join,
      above: Seq[Expression],
      conjuncts: Expression => Seq[Expression]): Option[LogicalPlan] = {
    // locate the registered fact scan anywhere in the join tree
    // (snowflakes nest joins: fact ⋈ dim1 ⋈ dim2 — the fact leaf may
    // sit arbitrarily deep). Exactly one: none means nothing to serve,
    // two means a fact self-join no single rollup can answer.
    final case class Fact(path: String, asOf: Option[Long],
        scanFilters: Seq[Expression], subtree: LogicalPlan)
    def find(p: LogicalPlan): Seq[Fact] = p match {
      case j: Join => find(j.left) ++ find(j.right)
      case other => scannedGraftPath(other)
        .filter(t => MvRegistry.lookup(t._1).isDefined)
        .map(t => Fact(t._1, t._2, t._3, other)).toSeq
    }
    val facts = find(jn)
    if (facts.length == 2)
      return rewriteJoinTwoFacts(agg, jn, above, conjuncts,
        facts.head.path, facts.head.asOf, facts.head.scanFilters,
        facts.head.subtree, facts(1).path, facts(1).asOf,
        facts(1).scanFilters, facts(1).subtree)
    if (facts.length != 1) return None
    val f = facts.head
    val d = MvRegistry.lookup(f.path).getOrElse(return None)
    // a union-MV source never serves a single-fact join rewrite (the
    // view folds its sibling sources' rows too)
    if (d.unionOf.nonEmpty) return None
    val factOut = f.subtree.outputSet
    def hasFact(p: LogicalPlan): Boolean = (p eq f.subtree) || (p match {
      case j: Join => hasFact(j.left) || hasFact(j.right)
      case _ => false
    })
    def isViewGroupCol(a: AttributeReference): Boolean =
      factOut.contains(a) &&
        d.groupCols.exists(_.equalsIgnoreCase(a.name))
    // every join on the fact's ANCESTOR path must be INNER — or a
    // FACT-PRESERVED outer join (LEFT with the fact on the left, RIGHT
    // with it on the right; d42): an unmatched fact key null-extends
    // ONCE per delta row exactly as each unmatched fact row does, so
    // the NULL-dim group folds sum(d_count) = its true row count, and
    // a NULL group of only-zombie keys folds to 0 and drops via the
    // liveness filter. The DIM-preserved direction refuses: an
    // unmatched dim row appears once in base but would join every
    // net-zero delta row of a fully-deleted key in the rewrite —
    // multiplicity the view cannot represent. Conditions must be
    // deterministic with fact-touching conjuncts equi-matching a view
    // group column against a non-fact column; dim-only conjuncts (and
    // whole dim-dim join subtrees) carry verbatim — they evaluate
    // identically on the rewritten rows
    def validate(p: LogicalPlan): Boolean = p match {
      case j: Join if hasFact(j) =>
        (j.joinType == Inner ||
          (j.joinType == LeftOuter && hasFact(j.left)) ||
          (j.joinType == RightOuter && hasFact(j.right))) &&
          j.condition.isDefined &&
          j.condition.get.deterministic &&
          conjuncts(j.condition.get).forall { c =>
            if (!c.references.exists(factOut.contains)) true
            else c match {
              case EqualTo(a: AttributeReference, b: AttributeReference)
                  if isViewGroupCol(a) && !factOut.contains(b) => true
              case EqualTo(a: AttributeReference, b: AttributeReference)
                  if isViewGroupCol(b) && !factOut.contains(a) => true
              case _ => false
            }
          } && validate(if (hasFact(j.left)) j.left else j.right)
      case _ => true // the fact leaf itself
    }
    if (!validate(jn)) return None
    // grouping: plain attrs only; non-fact attrs pass through,
    // fact-side attrs must be view group columns. nonEmpty: the
    // liveness filter would drop a global aggregate's single row
    // after a full delete.
    val gAttrsOpt = agg.groupingExpressions.map {
      case a: AttributeReference => Some(a)
      case _ => None
    }
    if (gAttrsOpt.isEmpty || gAttrsOpt.exists(_.isEmpty)) return None
    val gAttrs = gAttrsOpt.flatten
    val (gsFact, gsDim) = gAttrs.partition(a => factOut.contains(a))
    if (gsFact.exists(a => !isViewGroupCol(a))) return None
    // fact-side scan filters: the single-table gate (deterministic,
    // view group columns only); filters between the join and the
    // aggregate: deterministic, non-fact columns or fact view-group
    // columns only (whole-bucket predicates on either side)
    if (!f.scanFilters.forall(fl => fl.deterministic &&
        fl.references.forall(a =>
          d.groupCols.exists(_.equalsIgnoreCase(a.name)))))
      return None
    if (!above.forall(fl => fl.deterministic && fl.references.forall {
        case a: AttributeReference =>
          !factOut.contains(a) || isViewGroupCol(a)
        case _ => false
      }))
      return None
    // fact attrs referenced anywhere outside the fact subtree — each
    // needs a view twin for substitution
    def ancestorConds(p: LogicalPlan): Seq[Expression] = p match {
      case j: Join if hasFact(j) =>
        j.condition.toSeq ++
          ancestorConds(if (hasFact(j.left)) j.left else j.right)
      case _ => Nil
    }
    deltaSource(d, f.path, f.asOf).flatMap { viewPlan =>
      def vAttr(n: String): Option[AttributeReference] =
        viewPlan.output.collectFirst {
          case a: AttributeReference if a.name.equalsIgnoreCase(n) => a }
      val factRefAttrs: Seq[AttributeReference] =
        ((ancestorConds(jn) ++ above).flatMap(_.references.toSeq)
          .collect {
            case a: AttributeReference if factOut.contains(a) => a } ++
          gsFact).distinct
      val subPairs = factRefAttrs.flatMap(a =>
        vAttr(a.name).map(v => a.exprId -> v))
      if (subPairs.length != factRefAttrs.length) None
      else {
        val subMap = subPairs.toMap
        def subFact(e: Expression): Expression = e.transform {
          case a: AttributeReference if subMap.contains(a.exprId) =>
            subMap(a.exprId)
        }
        // the assembler: build() hands us the scan-filtered view; we
        // rebuild the ORIGINAL join tree with the fact subtree swapped
        // for it (fact refs in ancestor conditions substituted to view
        // attrs; every dim subtree untouched), then re-apply the
        // join-level filters
        def rebuildTree(p: LogicalPlan, v: LogicalPlan): LogicalPlan =
          if (p eq f.subtree) v
          else p match {
            case j: Join if hasFact(j) =>
              // joinType carries verbatim: validate() admitted only
              // Inner and fact-preserved outer types
              if (hasFact(j.left))
                Join(rebuildTree(j.left, v), j.right, j.joinType,
                  j.condition.map(subFact), JoinHint.NONE)
              else
                Join(j.left, rebuildTree(j.right, v), j.joinType,
                  j.condition.map(subFact), JoinHint.NONE)
            case other => other
          }
        def assembleChild(filteredView: LogicalPlan): LogicalPlan =
          above.foldLeft(rebuildTree(jn, filteredView))((p, fl) =>
            Filter(subFact(fl), p))
        build(agg, d, gsFact, viewPlan, f.scanFilters,
          factOk = a => factOut.contains(a),
          assembleChild = assembleChild,
          passThroughGroups = gsDim)
      }
    }
  }

  /** The TWO-FACT join-MV rewrite (double eager aggregation — Yan &
    * Larson's pushdown applied to BOTH join inputs): an aggregate over
    * `fact1 ⋈_inner fact2 ON k1 = k2 GROUP BY k` where both sides are
    * registered fact scans — the medallion "gold revenue × gold
    * volume" shape — is served by joining the two views pre-aggregated
    * to key granularity and folding CROSS-WEIGHTED moments.
    *
    * Soundness: each fact1 row replicates once per matching fact2 row,
    * so per join key `count(*) = cnt1(k)·cnt2(k)`,
    * `sum(v1) = sum1(k)·cnt2(k)`, `#nonnull(v1) = vcnt1(k)·cnt2(k)` —
    * and the per-key join of pre-aggregates yields exactly one row per
    * surviving key carrying those factors, so the weighted fold equals
    * the base plan's answer in exact decimal. Zombie (fully-deleted)
    * keys fold cnt = 0 and zero every product — exactly the empty
    * join they produce in base — and a group of only-zombie keys drops
    * via the `__mv_cnt > 0` liveness filter; a NULL join key fails the
    * equi-condition on both plans.
    *
    * ADDITIVE moments only — count(1), the exact-decimal sum, avg:
    * extrema refuse (a key whose OTHER side was fully deleted must not
    * contribute its folded extremum, per-key liveness a global min
    * cannot express), stddev/var refuse (kept to the single-fact
    * path). The weighted products run in decimal(29,10)×decimal(8,0)
    * → decimal(38,10) — exact, with a loud RaiseError if a per-key sum
    * or count overflows those bounds (wrong-but-fast is never
    * acceptable; an error is recoverable).
    *
    * Gates: the join is EXACTLY the two fact subtrees (fact ⋈ dims ⋈
    * fact does not serve — compose the d35 star per fact instead);
    * inner, deterministic, every conjunct an equi-pair of view group
    * columns across the two sides; distinct sources (a fact self-join
    * needs doubled multiplicity bookkeeping — refused); grouping and
    * every filter on view group columns only; each side passes the
    * single-fact freshness/compensation gates independently via
    * [[deltaSource]]. */
  private def rewriteJoinTwoFacts(agg: Aggregate, jn: Join,
      above: Seq[Expression], conjuncts: Expression => Seq[Expression],
      path1: String, asOf1: Option[Long], scan1: Seq[Expression],
      sub1: LogicalPlan, path2: String, asOf2: Option[Long],
      scan2: Seq[Expression], sub2: LogicalPlan): Option[LogicalPlan] = {
    // the join must be exactly fact1 ⋈ fact2 — each side's subtree IS
    // a join input (find() returns the left subtree's fact first)
    if (!(sub1 eq jn.left) || !(sub2 eq jn.right)) return None
    if (jn.joinType != Inner) return None
    val cond = jn.condition.getOrElse(return None)
    if (!cond.deterministic) return None
    if (MvRegistry.normPath(path1) == MvRegistry.normPath(path2))
      return None // self-join: multiplicity doubles, not cross-weights
    val d1 = MvRegistry.lookup(path1).getOrElse(return None)
    val d2 = MvRegistry.lookup(path2).getOrElse(return None)
    if (d1.unionOf.nonEmpty || d2.unionOf.nonEmpty) return None
    val (out1, out2) = (sub1.outputSet, sub2.outputSet)
    def isVG(a: org.apache.spark.sql.catalyst.expressions.Attribute,
        out: AttributeSet, d: MvRegistry.MvDef): Boolean =
      out.contains(a) && d.groupCols.exists(_.equalsIgnoreCase(a.name))
    def vg1(a: org.apache.spark.sql.catalyst.expressions.Attribute) =
      isVG(a, out1, d1)
    def vg2(a: org.apache.spark.sql.catalyst.expressions.Attribute) =
      isVG(a, out2, d2)
    // every conjunct equi-pairs view group columns across the sides
    if (!conjuncts(cond).forall {
        case EqualTo(a: AttributeReference, b: AttributeReference) =>
          (vg1(a) && vg2(b)) || (vg1(b) && vg2(a))
        case _ => false
      }) return None
    // grouping: plain view-group attrs of either side, non-empty
    val gAttrsOpt = agg.groupingExpressions.map {
      case a: AttributeReference if vg1(a) || vg2(a) => Some(a)
      case _ => None
    }
    if (gAttrsOpt.isEmpty || gAttrsOpt.exists(_.isEmpty)) return None
    // filters: deterministic whole-bucket predicates per side (scan)
    // or across both (join-level)
    if (!scan1.forall(f => f.deterministic && f.references.forall(vg1)))
      return None
    if (!scan2.forall(f => f.deterministic && f.references.forall(vg2)))
      return None
    if (!above.forall(f => f.deterministic &&
        f.references.forall(a => vg1(a) || vg2(a)))) return None
    for {
      v1 <- deltaSource(d1, path1, asOf1)
      v2 <- deltaSource(d2, path2, asOf2)
      out <- buildTwoFacts(agg, d1, d2, v1, v2, out1, out2, cond,
        above, scan1, scan2)
    } yield out
  }

  private def buildTwoFacts(agg: Aggregate, d1: MvRegistry.MvDef,
      d2: MvRegistry.MvDef, v1: LogicalPlan, v2: LogicalPlan,
      out1: AttributeSet, out2: AttributeSet, cond: Expression,
      above: Seq[Expression], scan1: Seq[Expression],
      scan2: Seq[Expression]): Option[LogicalPlan] = {
    def sumOf(e: Expression): Expression =
      new Sum(e).toAggregateExpression()
    // per-side pre-aggregate: the view's delta rows folded to ONE row
    // per key — (groupCols, __cnt, __sval, [__vcnt]) — with the
    // side's scan filters applied on the delta rows first (whole-
    // bucket predicates, same rows as the fact scan they replace)
    final case class Pre(plan: Aggregate,
        groupByName: Map[String, AttributeReference],
        cnt: org.apache.spark.sql.catalyst.expressions.Attribute,
        sval: org.apache.spark.sql.catalyst.expressions.Attribute,
        vcnt: Option[org.apache.spark.sql.catalyst.expressions.Attribute],
        valueNullable: Boolean)
    def pre(view: LogicalPlan, d: MvRegistry.MvDef,
        scanFs: Seq[Expression]): Option[Pre] = {
      def vAttr(n: String): Option[AttributeReference] =
        view.output.collectFirst {
          case a: AttributeReference if a.name.equalsIgnoreCase(n) => a }
      for {
        dCount <- vAttr("d_count")
        dValue <- vAttr("d_value")
        gAttrs <- {
          val gs = d.groupCols.flatMap(vAttr)
          if (gs.length == d.groupCols.length) Some(gs) else None
        }
        filtered <- {
          // substitute filter refs onto the view's attrs by name; a
          // ref without a view twin cannot be served
          var ok = true
          val p = scanFs.foldLeft(view)((p, f) => Filter(f.transform {
            case a: AttributeReference =>
              vAttr(a.name).getOrElse { ok = false; a }
          }, p))
          if (ok) Some(p) else None
        }
      } yield {
        val cntA = Alias(sumOf(dCount), "__cnt")()
        val svalA = Alias(sumOf(dValue), "__sval")()
        val vcntA = vAttr("d_vcount").map(v =>
          Alias(sumOf(v), "__vcnt")())
        Pre(Aggregate(gAttrs,
            gAttrs ++ (Seq(cntA, svalA) ++ vcntA.toSeq), filtered),
          gAttrs.map(a => a.name.toLowerCase -> a).toMap,
          cntA.toAttribute, svalA.toAttribute,
          vcntA.map(_.toAttribute), valueNullable = true)
      }
    }
    (pre(v1, d1, scan1), pre(v2, d2, scan2)) match {
      case (Some(p1), Some(p2)) =>
        // original fact attr -> its pre-aggregate twin, by side + name
        def twin(a: AttributeReference): Option[AttributeReference] =
          if (out1.contains(a)) p1.groupByName.get(a.name.toLowerCase)
          else if (out2.contains(a))
            p2.groupByName.get(a.name.toLowerCase)
          else None
        var ok = true
        def subRefs(e: Expression): Expression = e.transform {
          case a: AttributeReference =>
            twin(a).getOrElse { ok = false; a }
        }
        val joined = Join(p1.plan, p2.plan, Inner,
          Some(subRefs(cond)), JoinHint.NONE)
        val withAbove = above.foldLeft(joined: LogicalPlan)((p, f) =>
          Filter(subRefs(f), p))
        if (!ok) return None
        // the cross-weighted exact product: per-key sum × other-side
        // count in decimal(29,10) × decimal(8,0) → decimal(38,10).
        // LEGACY cast overflow yields NULL, which Sum would silently
        // skip — a wrong answer; fail loudly instead.
        def weighted(sval: org.apache.spark.sql.catalyst.expressions
              .Attribute,
            otherCnt: org.apache.spark.sql.catalyst.expressions
              .Attribute): Expression = {
          val prod = Multiply(Cast(sval, DecimalType(29, 10)),
            Cast(otherCnt, DecimalType(8, 0)), EvalMode.LEGACY)
          If(And(IsNotNull(sval), IsNull(prod)),
            Cast(new RaiseError(Literal(
              "graft two-fact MV rewrite: weighted sum overflows " +
                "decimal(29,10)x(8,0); query the base tables")),
              DecimalType(38, 10)),
            prod)
        }
        // per-key count products run in decimal too — a long-by-long
        // Multiply wraps SILENTLY on overflow in LEGACY mode, and the
        // product feeds both count(*) and the __mv_cnt liveness filter.
        // decimal(29,0) × decimal(8,0) → decimal(38,0) exact, with the
        // same IsNull-then-RaiseError guard the weighted sums get.
        def cntProduct(c1: org.apache.spark.sql.catalyst.expressions
              .Attribute,
            c2: org.apache.spark.sql.catalyst.expressions.Attribute)
            : Expression = {
          val prod = Multiply(Cast(c1, DecimalType(29, 0)),
            Cast(c2, DecimalType(8, 0)), EvalMode.LEGACY)
          If(And(IsNotNull(c1), IsNull(prod)),
            Cast(new RaiseError(Literal(
              "graft two-fact MV rewrite: per-key count product " +
                "overflows decimal(29,0)x(8,0); query the base tables")),
              DecimalType(38, 0)),
            prod)
        }
        val pairCnt = cntProduct(p1.cnt, p2.cnt)
        def exactDecimalOf(c: Expression, out: AttributeSet,
            d: MvRegistry.MvDef): Boolean = c match {
          case Cast(a: AttributeReference, dt: DecimalType, _, _) =>
            out.contains(a) && a.name.equalsIgnoreCase(d.valueCol) &&
              dt.precision == 38 && dt.scale == 10
          case _ => false
        }
        // n for avg: the side's non-null value count (d_vcount), or
        // its row count when the scanned value attr is provably
        // non-nullable
        def nOf(c: Expression, p: Pre)
            : Option[org.apache.spark.sql.catalyst.expressions.Attribute] =
          p.vcnt.orElse {
            val a = c.collectFirst { case ar: AttributeReference => ar }
            if (a.exists(!_.nullable)) Some(p.cnt) else None
          }
        def sideOf(c: Expression): Option[(Pre, Pre)] =
          if (exactDecimalOf(c, out1, d1)) Some((p1, p2))
          else if (exactDecimalOf(c, out2, d2)) Some((p2, p1))
          else None
        def sub(e: Expression): Expression = e match {
          case a: AttributeReference if twin(a).isDefined => twin(a).get
          case ae: AggregateExpression
              if !ae.isDistinct && ae.filter.isEmpty =>
            ae.aggregateFunction match {
              case Count(Seq(Literal(_, _))) =>
                Cast(sumOf(pairCnt), ae.dataType)
              case Sum(c, _) if sideOf(c).isDefined =>
                val (mine, other) = sideOf(c).get
                Cast(sumOf(weighted(mine.sval, other.cnt)), ae.dataType)
              case Average(c, _) if sideOf(c).isDefined &&
                  nOf(c, sideOf(c).get._1).isDefined =>
                val (mine, other) = sideOf(c).get
                Cast(
                  Divide(sumOf(weighted(mine.sval, other.cnt)),
                    Cast(sumOf(cntProduct(nOf(c, mine).get, other.cnt)),
                      DecimalType(20, 0)),
                    EvalMode.LEGACY),
                  ae.dataType)
              case _ => ok = false; ae
            }
          // a DISTINCT or FILTER aggregate must NOT fall through to the
          // generic recursion below: mapChildren would substitute view
          // twins INSIDE the aggregate function — sum(DISTINCT cast(v))
          // would leave the fact's value attr unresolved, and
          // count(DISTINCT k) over the pre-aggregate join would count
          // zombie fully-deleted keys the join still carries. Refuse.
          case ae: AggregateExpression => ok = false; ae
          case other => other.mapChildren(sub)
        }
        val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions
          .map {
            case a: Alias =>
              a.withNewChildren(Seq(sub(a.child)))
                .asInstanceOf[NamedExpression]
            case a: AttributeReference if twin(a).isDefined =>
              if (twin(a).get.exprId == a.exprId) a
              else Alias(twin(a).get, a.name)(exprId = a.exprId)
            case _ => ok = false
              agg.aggregateExpressions.head // unused: ok=false bails
          }
        val newGroups = agg.groupingExpressions.collect {
          case a: AttributeReference if twin(a).isDefined => twin(a).get
        }
        if (!ok ||
          newGroups.length != agg.groupingExpressions.length) None
        else {
          val cnt = Alias(sumOf(pairCnt), "__mv_cnt")()
          val rewritten = Aggregate(
            newGroups, newAggExprs :+ cnt, withAbove)
          // pairCnt folds in decimal(38,0) now — compare same-typed
          val filtered = Filter(
            GreaterThan(cnt.toAttribute,
              Literal(org.apache.spark.sql.types.Decimal(0),
                DecimalType(38, 0))), rewritten)
          Some(Project(newAggExprs.map(_.toAttribute), filtered))
        }
      case _ => None
    }
  }

  /** The UNION-MV rewrite: ONE maintained rollup serves an aggregate
    * over the UNION ALL of its fact sources — the medallion fan-in
    * shape (events_mobile ∪ events_web → one dashboard). Sound because
    * the view folds each source's signed deltas additively, which is
    * exactly UNION ALL's bag semantics; gates: every union child is a
    * bare (unfiltered, latest-snapshot) scan of a registered source of
    * the SAME union-MV, each source exactly once and the set complete
    * (a missing or extra leg would change the answer), EVERY source
    * fresh under its own ledger app id, and union-level filters
    * reference view group columns only. */
  private def tryRewriteUnion(agg: Aggregate): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.plans.logical.Union
    def unwrap(p: LogicalPlan, fs: Seq[Expression])
        : Option[(Union, Seq[Expression])] = p match {
      case SubqueryAlias(_, c) => unwrap(c, fs)
      case Project(ps, c)
          if ps.forall(_.isInstanceOf[AttributeReference]) =>
        unwrap(c, fs)
      case Filter(cond, c) => unwrap(c, cond +: fs)
      case un: Union => Some((un, fs))
      case _ => None
    }
    unwrap(agg.child, Seq.empty).flatMap { case (un, above) =>
      rewriteUnion(agg, un, above) }
  }

  private def rewriteUnion(agg: Aggregate,
      un: org.apache.spark.sql.catalyst.plans.logical.Union,
      above: Seq[Expression]): Option[LogicalPlan] = {
    // chained unions nest at analysis time (Union(Union(a,b),c)) —
    // flatten to the leaf legs
    def legs(p: LogicalPlan): Seq[LogicalPlan] = p match {
      case u2: org.apache.spark.sql.catalyst.plans.logical.Union =>
        u2.children.flatMap(legs)
      case other => Seq(other)
    }
    val legPlans = legs(un)
    // UNION is POSITIONAL: every leg's columns must line up with the
    // union output BY NAME — a reordering (attribute-only) projection
    // on one leg would silently feed one table's column into
    // another's slot, an answer the view cannot represent
    if (legPlans.exists(l => l.output.map(_.name.toLowerCase) !=
        un.output.map(_.name.toLowerCase))) return None
    val kids = legPlans.map(scannedGraftPath)
    if (kids.exists(_.isEmpty)) return None
    val infos = kids.flatten
    // no time-traveled legs (the view folds CURRENT state), and no
    // per-leg filters (a predicate on ONE leg is not a predicate on
    // the union — the view cannot answer it)
    if (infos.exists(_._2.nonEmpty)) return None
    if (infos.exists(_._3.nonEmpty)) return None
    val paths = infos.map(t => MvRegistry.normPath(t._1))
    val defs = paths.map(MvRegistry.lookup)
    if (defs.exists(_.isEmpty)) return None
    val d = defs.head.get
    if (d.unionOf.isEmpty || defs.exists(_.get != d)) return None
    if (paths.distinct.size != paths.size) return None
    if (paths.toSet != d.unionOf.map(MvRegistry.normPath).toSet)
      return None
    if (!above.forall(f => f.deterministic && f.references.forall(a =>
        d.groupCols.exists(_.equalsIgnoreCase(a.name)))))
      return None
    // grouping: the single-table gate, resolved against the union's
    // output attributes
    val gs = {
      val attrs = agg.groupingExpressions.collect {
        case a: AttributeReference => a }
      if (attrs.nonEmpty &&
          attrs.length == agg.groupingExpressions.length &&
          attrs.map(_.name.toLowerCase).distinct.length == attrs.length &&
          attrs.forall(a =>
            d.groupCols.exists(_.equalsIgnoreCase(a.name))))
        attrs
      else return None
    }
    deltaSourceUnion(d).flatMap(viewPlan =>
      build(agg, d, gs, viewPlan, above))
  }

  /** The pinned view plan for a UNION-MV, served only when EVERY
    * source's ledger high-water (under its per-source app id, read at
    * one pinned view snapshot) equals that source's latest commit. No
    * compensation path: a stale leg falls back to the base union. */
  private def deltaSourceUnion(d: MvRegistry.MvDef)
      : Option[LogicalPlan] = {
    import org.apache.spark.sql.functions.col
    GraftMvRewriteRule.raceSeam()
    val vPin = GraftLog.versions(spark, d.view).lastOption
    if (vPin.isEmpty) return None
    val fresh = d.unionOf.forall { s =>
      val latest = GraftLog.versions(spark, s).lastOption
      latest.isDefined && GraftLog.lastCommittedBatch(spark, d.view,
        MvRegistry.unionAppId(d.appId, s), vPin) == latest
    }
    if (!fresh) return None
    val viewRaw = spark.read.format("graft")
      .option("versionAsOf", vPin.get.toString).load(d.view)
    val poisoned = scala.util.Try(
      GraftLog.properties(spark, d.view, vPin)
        .get(graft.operators.AggView.SumsqOverflowProp)
        .exists(_.equalsIgnoreCase("true"))).getOrElse(true)
    val hasSq = !poisoned &&
      viewRaw.schema.fieldNames.exists(_ == "d_sumsq")
    val hasV = viewRaw.schema.fieldNames.exists(_ == "d_vcount")
    // extrema never serve from the union form: per-source remove
    // tracking is not maintained there, and min/max are the one
    // non-additive pair
    Some(viewRaw
      .select(d.groupCols.map(col) ++
        Seq(col("d_count"), col("d_value")) ++
        (if (hasSq) Seq(col("d_sumsq")) else Nil) ++
        (if (hasV) Seq(col("d_vcount")) else Nil): _*)
      .queryExecution.analyzed)
  }

  /** The delta-log plan the rewritten aggregate folds. FRESH view
    * (ledger high-water == source latest): the view table verbatim.
    * STALE + `compensate`: the view's deltas UNIONed with per-row
    * deltas derived from the source's CDF tail (high-water, latest] —
    * exactly what the next `maintain` would fold, read file-bounded,
    * so the answer is current at O(changes) extra cost. Stale without
    * compensation (or an unreadable tail, e.g. vacuumed versions):
    * None → base plan — wrong-but-fast is never acceptable. */
  private def deltaSource(d: MvRegistry.MvDef, src: String,
      asOf: Option[Long])
      : Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val latest = GraftLog.versions(spark, src).lastOption
    // TIME-TRAVELED scan: the view folds the CURRENT state; a
    // versionAsOf/timestampAsOf read at anything but the latest
    // snapshot must keep its base plan (wrong-but-fast is never
    // acceptable — a historical answer least of all)
    if (asOf.nonEmpty && asOf != latest) return None
    GraftMvRewriteRule.raceSeam()
    // pin ONE view snapshot version and read both the maintenance
    // ledger AND the file scan at it: a maintenance commit landing
    // between a naive ledger read and the scan would otherwise pair an
    // old high-water with a newer delta log — the compensated path
    // would then fold the same source versions twice (view + CDF
    // tail), a torn answer equal to neither the pre- nor post-commit
    // state. With the pin, concurrent maintenance only shifts WHICH
    // consistent snapshot serves.
    val vPin = GraftLog.versions(spark, d.view).lastOption
    if (vPin.isEmpty) return None
    val hw = GraftLog.lastCommittedBatch(spark, d.view, d.appId, vPin)
    val viewRaw = spark.read.format("graft")
      .option("versionAsOf", vPin.get.toString).load(d.view)
    // d_sumsq is the second-moment column newer views maintain for the
    // stddev decomposition; older views lack it — select it only when
    // present (build() refuses stddev rewrites without it). A view
    // whose maintenance ever dropped a square to decimal overflow
    // (|value| ≥ ~1e14 → NULL cast, silently skipped by Sum) carries
    // the poison property and its moment must not serve — read at the
    // pinned snapshot so the check and the scan agree.
    val poisoned = scala.util.Try(
      GraftLog.properties(spark, d.view, vPin)
        .get(graft.operators.AggView.SumsqOverflowProp)
        .exists(_.equalsIgnoreCase("true"))).getOrElse(true)
    val hasSq = !poisoned &&
      viewRaw.schema.fieldNames.exists(_ == "d_sumsq")
    // d_vcount is the NON-NULL value count newer views maintain:
    // avg/stddev/var divide by the count of non-null values, and
    // d_count counts rows — build() falls back to d_count only when
    // the scanned value attribute is provably non-nullable
    val hasV = viewRaw.schema.fieldNames.exists(_ == "d_vcount")
    // per-commit extrema serve min/max ONLY while the source is
    // insert-only (the removes property unset — a deleted row may have
    // been the extremum and no delta restores it) AND the view is
    // FRESH (the CDF tail may carry removes the property cannot see
    // yet, so the compensated path never serves extrema)
    val isFresh = latest.exists(v => hw.contains(v))
    val removesSeen = scala.util.Try(
      GraftLog.properties(spark, d.view, vPin)
        .get(graft.operators.AggView.RemovesSeenProp)
        .exists(_.equalsIgnoreCase("true"))).getOrElse(true)
    val hasMinMax = isFresh && !removesSeen &&
      viewRaw.schema.fieldNames.contains("d_min") &&
      viewRaw.schema.fieldNames.contains("d_max")
    val viewDf = viewRaw
      .select(d.groupCols.map(col) ++
        Seq(col("d_count"), col("d_value")) ++
        (if (hasSq) Seq(col("d_sumsq")) else Nil) ++
        (if (hasV) Seq(col("d_vcount")) else Nil) ++
        (if (hasMinMax) Seq(col("d_min"), col("d_max")) else Nil): _*)
    if (latest.exists(v => hw.contains(v)))
      Some(viewDf.queryExecution.analyzed)
    else if (d.compensate && d.key.nonEmpty && hw.isDefined &&
        latest.isDefined) try {
      val tail = spark.read.format("graft")
        .option("readChangeFeed", "true")
        .option("cdfKeys", d.key)
        .option("includePreimages", "true")
        .option("startingVersion", (hw.get + 1).toString)
        .option("endingVersion", latest.get.toString)
        .load(src)
      val sign = when(col("_change_type")
          .isin("insert", "update_postimage"), lit(1L))
        .otherwise(lit(-1L))
      val vd = col(d.valueCol).cast("double")
      // overflow in the TAIL is runtime data the plan-time poison
      // property cannot see: fail loudly rather than silently drop
      // the square (wrong-but-fast is never acceptable; an error is
      // recoverable, a wrong moment is not)
      val sq = (sign * vd * vd).cast("decimal(38,10)")
      val sqSafe = when(vd.isNotNull && sq.isNull,
        org.apache.spark.sql.functions.raise_error(lit(
          "graft MV compensation: second-moment square overflows " +
            "decimal(38,10); refresh the view instead"))).otherwise(sq)
      val tailDeltas = tail.select(d.groupCols.map(col) ++ Seq(
        sign.as("d_count"),
        (sign * col(d.valueCol)).cast("decimal(38,10)").as("d_value")) ++
        (if (hasSq) Seq(sqSafe.as("d_sumsq")) else Nil) ++
        (if (hasV) Seq(
          (sign * when(col(d.valueCol).isNull, 0L).otherwise(1L))
            .as("d_vcount")) else Nil): _*)
      Some(viewDf.unionByName(tailDeltas).queryExecution.analyzed)
    } catch { case scala.util.control.NonFatal(_) => None }
    else None
  }

  /** The exact-second-moment rewrite shared by stddev_samp and
    * var_samp: (Σx² − (Σx)²/n) / (n−1), sqrt for stddev. `nCount` is
    * the view's NON-NULL value count (`d_vcount`; `d_count` only for a
    * provably non-nullable value column) — the base operators
    * aggregate non-null rows only, so an all-NULL group serves NULL
    * here exactly as the base plan would. n==0/1
    * mirrors the expressions' own divide-by-zero contract (NULL by
    * default, NaN under the legacy statistical-aggregate flag); the
    * tiny-negative clamp guards the float subtraction (Welford
    * guarantees m2 ≥ 0; the two-pass form can land at −1e−12). */
  private def moment2(nCount: AttributeReference,
      dValue: AttributeReference, dSumsq: AttributeReference,
      nullOnDiv: Boolean, sqrtIt: Boolean): Expression = {
    def sumOf(a: AttributeReference): Expression =
      new Sum(a).toAggregateExpression()
    val nD = Cast(sumOf(nCount), DoubleType)
    val svD = Cast(sumOf(dValue), DoubleType)
    val sqD = Cast(sumOf(dSumsq), DoubleType)
    val m2 = Subtract(sqD,
      Divide(Multiply(svD, svD, EvalMode.LEGACY), nD,
        EvalMode.LEGACY), EvalMode.LEGACY)
    val core = Divide(
      Greatest(Seq(m2, Literal(0.0d))),
      Subtract(nD, Literal(1.0d), EvalMode.LEGACY),
      EvalMode.LEGACY)
    If(EqualTo(sumOf(nCount), Literal(0L)),
      Literal(null, DoubleType),
      If(EqualTo(sumOf(nCount), Literal(1L)),
        if (nullOnDiv) Literal(null, DoubleType)
        else Literal(Double.NaN, DoubleType),
        if (sqrtIt) Sqrt(core) else core))
  }

  private def build(agg: Aggregate, d: MvRegistry.MvDef,
      gs: Seq[AttributeReference],
      viewPlan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      scanFilters: Seq[Expression] = Seq.empty,
      // join-rewrite seams (identity/true/empty on the single-table
      // path): `factOk` gates value-column NAME matches to fact-side
      // attributes — in a join a dim column that happens to share the
      // value column's name must not be served from the view;
      // `assembleChild` wraps the filtered view into the rewritten
      // child (the join rewrite rebuilds Join(view, dim) + carried
      // filters here); `passThroughGroups` are grouping attrs the view
      // does not carry (dim-side columns) — they map to themselves.
      factOk: AttributeReference => Boolean = _ => true,
      assembleChild: LogicalPlan => LogicalPlan = identity,
      passThroughGroups: Seq[AttributeReference] = Seq.empty)
      : Option[LogicalPlan] = {
    def attr(n: String): Option[AttributeReference] =
      viewPlan.output.collectFirst {
        case a: AttributeReference if a.name.equalsIgnoreCase(n) => a }
    // original grouping attr exprId -> the view-side twin (dim-side
    // pass-throughs map to themselves), in the ORIGINAL grouping order
    val groupMap: Map[org.apache.spark.sql.catalyst.expressions.ExprId,
      AttributeReference] = (gs.flatMap(a =>
        attr(a.name).map(v => a.exprId -> v)) ++
        passThroughGroups.map(a => a.exprId -> a)).toMap
    (groupMap.size == gs.length + passThroughGroups.length,
        attr("d_count"), attr("d_value")) match {
      case (true, Some(dCount), Some(dValue)) =>
        val dSumsq = attr("d_sumsq")
        val dVcount = attr("d_vcount")
        // the n for avg/stddev/var: the base operators count NON-NULL
        // value rows, d_count counts ALL rows. A d_vcount-bearing view
        // serves any value column; without it, d_count is a sound n
        // only when the scanned value attribute is provably
        // non-nullable — otherwise refuse (a NULL-bearing column would
        // silently shift the divisor).
        def nFor(c: Expression): Option[AttributeReference] =
          dVcount.orElse {
            val a = c.collectFirst { case ar: AttributeReference => ar }
            if (a.exists(!_.nullable)) Some(dCount) else None
          }
        val dMin = attr("d_min")
        val dMax = attr("d_max")
        def bareValue(c: Expression): Boolean = c match {
          case a: AttributeReference =>
            factOk(a) && a.name.equalsIgnoreCase(d.valueCol)
          case _ => false
        }
        // the exact-decimal discipline: the decimal(38,10) cast must
        // wrap the value column DIRECTLY — no intermediate casts. A
        // nested cast (e.g. cast(cast(v AS INT) AS DECIMAL(38,10)))
        // truncates in the base plan; serving it from the view's exact
        // sum would silently change the query's result.
        def exactDecimalOfValue(c: Expression): Boolean = c match {
          case Cast(a: AttributeReference, dt: DecimalType, _, _) =>
            factOk(a) && a.name.equalsIgnoreCase(d.valueCol) &&
              dt.precision == 38 && dt.scale == 10
          case _ => false
        }
        // the stddev gate: the per-row input is the value column as
        // the aggregate sees it in DOUBLE — the bare double attribute,
        // or one widening cast to double (what type coercion inserts
        // for non-double numeric columns). Exactly the values d_sumsq
        // squares during maintenance.
        def doubleOfValue(c: Expression): Boolean = c match {
          case a: AttributeReference =>
            factOk(a) && a.name.equalsIgnoreCase(d.valueCol) &&
              a.dataType == DoubleType
          case Cast(a: AttributeReference, DoubleType, _, _) =>
            factOk(a) && a.name.equalsIgnoreCase(d.valueCol)
          case _ => false
        }
        def sumOf(a: AttributeReference): Expression =
          new Sum(a).toAggregateExpression()
        // every aggregate expression must decompose; scalar wrappers
        // above the AggregateExpression carry over verbatim
        var ok = true
        def sub(e: Expression): Expression = e match {
          case a: AttributeReference if groupMap.contains(a.exprId) =>
            groupMap(a.exprId)
          case ae: AggregateExpression
              if !ae.isDistinct && ae.filter.isEmpty =>
            ae.aggregateFunction match {
              case Count(Seq(Literal(_, _))) => sumOf(dCount)
              case Sum(c, _) if exactDecimalOfValue(c) => sumOf(dValue)
              // avg = sum/count, rebuilt as Average's OWN internal
              // decomposition (Divide(sum, count cast decimal(20,0))
              // cast to the result type): decimal arithmetic is exact
              // and the folded sums equal the base plan's accumulators
              // bit-for-bit, so the rewrite is invisible
              case Average(c, _)
                  if exactDecimalOfValue(c) && nFor(c).isDefined =>
                Cast(
                  Divide(sumOf(dValue),
                    Cast(sumOf(nFor(c).get), DecimalType(20, 0)),
                    EvalMode.LEGACY),
                  ae.dataType)
              // stddev_samp / var_samp via the exact second moment:
              // (Σx² − (Σx)²/n) / (n−1), sqrt for stddev — both Σ
              // folded in exact decimal, only the final double ops
              // floating. The base ops (streaming Welford over
              // partitions) are themselves partition-order-dependent;
              // this serves the DETERMINISTIC textbook moment answer
              // within the same tolerance — the float-sum refusal
              // rationale applies to the final double math only.
              // Requires a d_sumsq-bearing view.
              // min/max fold over the per-commit extrema (min of
              // mins); deltaSource exposes d_min/d_max only while the
              // source is insert-only AND the view is fresh — a
              // removed row may have been the extremum. Bare value
              // attribute only, same type as the maintained column.
              case Min(c) if bareValue(c) && dMin.isDefined &&
                  c.dataType == dMin.get.dataType =>
                new Min(dMin.get).toAggregateExpression()
              case Max(c) if bareValue(c) && dMax.isDefined &&
                  c.dataType == dMax.get.dataType =>
                new Max(dMax.get).toAggregateExpression()
              case StddevSamp(c, nullOnDiv) if doubleOfValue(c) &&
                  dSumsq.isDefined && nFor(c).isDefined =>
                moment2(nFor(c).get, dValue, dSumsq.get, nullOnDiv,
                  sqrtIt = true)
              case VarianceSamp(c, nullOnDiv) if doubleOfValue(c) &&
                  dSumsq.isDefined && nFor(c).isDefined =>
                moment2(nFor(c).get, dValue, dSumsq.get, nullOnDiv,
                  sqrtIt = false)
              case _ => ok = false; ae
            }
          // DISTINCT/FILTER aggregates fail the guarded case above and
          // must not reach the generic recursion: mapChildren would
          // substitute group twins INSIDE the aggregate function (e.g.
          // count(DISTINCT g) counting delta-log bucket rows instead of
          // fact rows). Refuse the rewrite instead.
          case ae: AggregateExpression => ok = false; ae
          case other => other.mapChildren(sub)
        }
        val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions
          .map {
            case a: Alias =>
              a.withNewChildren(Seq(sub(a.child)))
                .asInstanceOf[NamedExpression]
            case a: AttributeReference if groupMap.contains(a.exprId) =>
              // a pass-through (dim-side) group attr maps to itself —
              // keep the bare reference rather than a self-alias
              if (groupMap(a.exprId).exprId == a.exprId) a
              else Alias(groupMap(a.exprId), a.name)(exprId = a.exprId)
            case _ => ok = false
              agg.aggregateExpressions.head // unused: ok=false bails
          }
        // filters may reference view group columns the QUERY does not
        // group by (the `WHERE f = 'x' GROUP BY g` dashboard shape) —
        // resolve those by name into the view; a reference that
        // resolves to neither refuses the rewrite
        val filterMap: Map[
          org.apache.spark.sql.catalyst.expressions.ExprId,
          AttributeReference] =
          scanFilters.flatMap(_.references).filterNot(a =>
            groupMap.contains(a.exprId)).flatMap(a =>
              attr(a.name).map(v => a.exprId -> v)).toMap
        val filterRefsOk = scanFilters.flatMap(_.references).forall(a =>
          groupMap.contains(a.exprId) || filterMap.contains(a.exprId))
        if (!ok || !filterRefsOk) None
        else {
          // view-group-column scan filters carry over onto the view's
          // rows (attribute-substituted) — a whole-bucket predicate
          // selects the same rows from per-bucket delta rows as the
          // original selects fact rows
          val filteredView = scanFilters.foldLeft(viewPlan) { (p, f) =>
            Filter(f.transform {
              case a: AttributeReference if groupMap.contains(a.exprId) =>
                groupMap(a.exprId)
              case a: AttributeReference if filterMap.contains(a.exprId) =>
                filterMap(a.exprId)
            }, p)
          }
          // hidden liveness count: delta-log groups whose running count
          // folded to 0 were fully deleted and must not resurface
          val cnt = Alias(
            new Sum(dCount).toAggregateExpression(), "__mv_cnt")()
          // grouping keys in the QUERY's original order (fact attrs →
          // view twins, dim pass-throughs verbatim); the child is the
          // filtered view, wrapped by the join assembler when present
          val newGroups = agg.groupingExpressions.collect {
            case a: AttributeReference if groupMap.contains(a.exprId) =>
              groupMap(a.exprId)
          }
          if (newGroups.length != agg.groupingExpressions.length) None
          else {
            val rewritten = Aggregate(
              newGroups, newAggExprs :+ cnt,
              assembleChild(filteredView))
            val filtered = Filter(
              GreaterThan(cnt.toAttribute, Literal(0L)), rewritten)
            Some(Project(newAggExprs.map(_.toAttribute), filtered))
          }
        }
      case _ => None
    }
  }
}
