package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Cast, Expression, GreaterThan, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

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
  *   - the view is FRESH: its maintenance ledger high-water equals the
  *     source's latest commit version (one small-JSON read each). A
  *     stale view silently falls back to the base-table plan — a
  *     wrong-but-fast answer is never acceptable;
  *   - the aggregate decomposes over the view's delta log: grouping on
  *     exactly the view's group column, aggregates limited to
  *     `count(1)` (→ `sum(d_count)`) and the exact-decimal
  *     `sum(cast(value as decimal(38,10)))` (→ `sum(d_value)`) with
  *     arbitrary scalar wrappers above the aggregate (round/cast carry
  *     over verbatim). A FLOAT sum is deliberately NOT rewritten: the
  *     view folds in exact decimal, and "the rewrite changed my
  *     floating-point sum" is a correctness bug, not a win.
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
  final case class MvDef(view: String, groupCols: Seq[String],
      valueCol: String, appId: String, key: String = "",
      compensate: Boolean = false)

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
  def unregister(src: String): Unit = { bySrc.remove(norm(src)): Unit }
  def clear(): Unit = bySrc.clear()
  def isEmpty: Boolean = bySrc.isEmpty
  def lookup(src: String): Option[MvDef] = bySrc.get(norm(src))
}

/** The session-extension-injected rule. Post-hoc resolution placement:
  * the aggregate is fully resolved, and the substituted plan re-enters
  * the remaining analysis batches like any other resolved tree. */
class GraftMvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvRegistry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** The source path scanned by `plan`, when it is (modulo aliases and
    * a pure-attribute projection) one graft relation. */
  private def scannedGraftPath(plan: LogicalPlan): Option[String] =
    plan match {
      case SubqueryAlias(_, child) => scannedGraftPath(child)
      case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        scannedGraftPath(child)
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        fs.location match {
          case g: GraftFileIndex => g.rootPaths.headOption.map(_.toString)
          case _ => None
        }
      case _ => None
    }

  private def stripCasts(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCasts(c)
    case other => other
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = for {
    src <- scannedGraftPath(agg.child)
    d <- MvRegistry.lookup(src)
    // grouping: exactly the view's group columns (any order)
    gs <- {
      val attrs = agg.groupingExpressions.collect {
        case a: AttributeReference => a }
      if (attrs.length == agg.groupingExpressions.length &&
          attrs.length == d.groupCols.length &&
          d.groupCols.forall(c =>
            attrs.exists(_.name.equalsIgnoreCase(c))))
        Some(attrs) else None
    }
    child <- deltaSource(d, src)
    rewritten <- build(agg, d, gs, child)
  } yield rewritten

  /** The delta-log plan the rewritten aggregate folds. FRESH view
    * (ledger high-water == source latest): the view table verbatim.
    * STALE + `compensate`: the view's deltas UNIONed with per-row
    * deltas derived from the source's CDF tail (high-water, latest] —
    * exactly what the next `maintain` would fold, read file-bounded,
    * so the answer is current at O(changes) extra cost. Stale without
    * compensation (or an unreadable tail, e.g. vacuumed versions):
    * None → base plan — wrong-but-fast is never acceptable. */
  private def deltaSource(d: MvRegistry.MvDef, src: String)
      : Option[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] = {
    import org.apache.spark.sql.functions.{col, lit, when}
    val latest = GraftLog.versions(spark, src).lastOption
    val hw = GraftLog.lastCommittedBatch(spark, d.view, d.appId)
    val viewDf = spark.read.format("graft").load(d.view)
      .select(d.groupCols.map(col) ++
        Seq(col("d_count"), col("d_value")): _*)
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
      val tailDeltas = tail.select(d.groupCols.map(col) ++ Seq(
        sign.as("d_count"),
        (sign * col(d.valueCol)).cast("decimal(38,10)").as("d_value")): _*)
      Some(viewDf.unionByName(tailDeltas).queryExecution.analyzed)
    } catch { case scala.util.control.NonFatal(_) => None }
    else None
  }

  private def build(agg: Aggregate, d: MvRegistry.MvDef,
      gs: Seq[AttributeReference],
      viewPlan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : Option[LogicalPlan] = {
    def attr(n: String): Option[AttributeReference] =
      viewPlan.output.collectFirst {
        case a: AttributeReference if a.name.equalsIgnoreCase(n) => a }
    // original grouping attr exprId -> the view-side twin, in the
    // ORIGINAL grouping order
    val groupMap: Map[org.apache.spark.sql.catalyst.expressions.ExprId,
      AttributeReference] = gs.flatMap(a =>
        attr(a.name).map(v => a.exprId -> v)).toMap
    (groupMap.size == gs.length, attr("d_count"), attr("d_value")) match {
      case (true, Some(dCount), Some(dValue)) =>
        // every aggregate expression must decompose; scalar wrappers
        // above the AggregateExpression carry over verbatim
        var ok = true
        def sub(e: Expression): Expression = e match {
          case a: AttributeReference if groupMap.contains(a.exprId) =>
            groupMap(a.exprId)
          case ae: AggregateExpression
              if !ae.isDistinct && ae.filter.isEmpty =>
            ae.aggregateFunction match {
              case Count(Seq(Literal(_, _))) =>
                new Sum(dCount).toAggregateExpression()
              case Sum(c, _) => stripCasts(c) match {
                // ONLY the exact-decimal discipline rewrites: the cast
                // to decimal(38,10) must wrap the value column directly
                case a: AttributeReference
                    if a.name.equalsIgnoreCase(d.valueCol) &&
                      (c match {
                        case Cast(_, dt: DecimalType, _, _) =>
                          dt.precision == 38 && dt.scale == 10
                        case _ => false
                      }) =>
                  new Sum(dValue).toAggregateExpression()
                case _ => ok = false; ae
              }
              case _ => ok = false; ae
            }
          case other => other.mapChildren(sub)
        }
        val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions
          .map {
            case a: Alias =>
              a.withNewChildren(Seq(sub(a.child)))
                .asInstanceOf[NamedExpression]
            case a: AttributeReference if groupMap.contains(a.exprId) =>
              Alias(groupMap(a.exprId), a.name)(exprId = a.exprId)
            case _ => ok = false
              agg.aggregateExpressions.head // unused: ok=false bails
          }
        if (!ok) None
        else {
          // hidden liveness count: delta-log groups whose running count
          // folded to 0 were fully deleted and must not resurface
          val cnt = Alias(
            new Sum(dCount).toAggregateExpression(), "__mv_cnt")()
          val rewritten = Aggregate(
            gs.map(a => groupMap(a.exprId)), newAggExprs :+ cnt, viewPlan)
          val filtered = Filter(
            GreaterThan(cnt.toAttribute, Literal(0L)), rewritten)
          Some(Project(newAggExprs.map(_.toAttribute), filtered))
        }
      case _ => None
    }
  }
}
