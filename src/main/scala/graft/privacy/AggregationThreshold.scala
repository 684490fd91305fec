package graft.privacy

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, ExprId, Expression, GreaterThanOrEqual, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, CountIf, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, CTERelationDef, CTERelationRef, Except, Filter, Generate, Intersect, Join, LogicalPlan, Project, Union, View, Window, WithCTE}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.SparkSessionExtensions

/** Aggregation-threshold privacy policy for a view (O23) — the semantics of
  * the reference's clean-room policy view
  * (`/root/reference/sql/sp_demo_cleanroom.sql:51-57`):
  *
  * ```
  * privacy_policy = {aggregation_threshold_policy:
  *   {threshold: 2, privacy_unit_columns: "customer_id"}}
  * ```
  *
  * Enforced rules, matching BigQuery's documented behavior:
  *  1. any query reading the view MUST aggregate — raw-row access is
  *     rejected at analysis time;
  *  2. every output group must be backed by >= `threshold` DISTINCT values
  *     of the privacy-unit column — under-threshold groups are suppressed.
  */
final case class AggregationThresholdPolicy(unitColumn: String, threshold: Int)

/** Policy attachment for views. A policy is never held in a side registry
  * keyed by name or timestamp — it is stamped INTO the view instance's own
  * catalog properties (the temp-view registry entry's `CatalogTable` for
  * session/global-temp views; the persistent catalog entry for durable
  * views). Enforcement reads the properties off the resolved [[View]] node,
  * so the binding is physically instance-exact:
  *   - a subquery alias sharing the view's name is not a view and carries
  *     no properties — never enforced against;
  *   - `CREATE OR REPLACE` mints a fresh relation without the properties —
  *     replacing a view without re-declaring its policy DROPS the policy,
  *     exactly as BigQuery's view-OPTIONS semantics do (options not
  *     restated are gone), even when the replacement lands within the same
  *     clock millisecond as the original (a ms-granularity createTime
  *     comparison could not tell those apart). */
object PolicyCatalog {
  /** View TBLPROPERTIES keys for a policy persisted WITH a catalog view
    * (BigQuery's `OPTIONS(privacy_policy=...)` model): the policy is part
    * of the view object, survives process restarts over a persistent
    * catalog, and dies with any CREATE OR REPLACE that omits it. */
  val UnitProp = "graft.privacy.unit"
  val ThresholdProp = "graft.privacy.threshold"

  /** Policy declared in a view's own catalog properties, if any.
    * FAIL-CLOSED on misdeclaration: a half-declared pair (one key missing)
    * or a non-numeric threshold is a policy the author INTENDED — treating
    * it as "no policy" would leave the view raw-readable, so both reject
    * every read of the view instead. */
  def fromProperties(props: Map[String, String]): Option[AggregationThresholdPolicy] =
    (props.get(UnitProp), props.get(ThresholdProp)) match {
      case (Some(u), Some(t)) =>
        val threshold = t.toIntOption.getOrElse(throw new PolicyViolationException(
          s"view property $ThresholdProp='$t' is not an integer"))
        Some(AggregationThresholdPolicy(u, threshold))
      case (None, None) => None
      case (u, t) => throw new PolicyViolationException(
        s"incomplete privacy policy on view: $UnitProp=${u.getOrElse("<missing>")}, " +
          s"$ThresholdProp=${t.getOrElse("<missing>")} — both properties are required")
    }

  /** Attach a policy to an EXISTING view (temp, global-temp or catalog) by
    * writing the policy properties onto that view instance's own metadata. */
  def setPolicy(spark: SparkSession, viewName: String,
                policy: AggregationThresholdPolicy): Unit =
    updatePropertiesOf(spark, viewName,
      _ + (UnitProp -> policy.unitColumn) + (ThresholdProp -> policy.threshold.toString))

  /** Strip a policy off the view instance (the other way a policy dies is
    * with the instance itself, via CREATE OR REPLACE / DROP). */
  def removePolicy(spark: SparkSession, viewName: String): Unit =
    try updatePropertiesOf(spark, viewName, _ - UnitProp - ThresholdProp)
    catch { case _: NoSuchElementException => () } // no such view -> nothing bound

  /** Shared by the sibling [[JoinRestrictionCatalog]] — one property-update
    * path for every policy kind stamped onto a view instance's metadata. */
  private[privacy] def updatePropertiesOf(spark: SparkSession, viewName: String,
      f: Map[String, String] => Map[String, String]): Unit = {
    val cat = spark.sessionState.catalog
    val ident = graft.util.Names.parseTableIdentifier(spark, viewName)
    def restamp(rel: org.apache.spark.sql.catalyst.catalog.TemporaryViewRelation) =
      rel.copy(tableMeta = rel.tableMeta.copy(properties = f(rel.tableMeta.properties)))
    if (ident.database.isEmpty && cat.getRawTempView(ident.table).isDefined)
      cat.createTempView(ident.table,
        restamp(cat.getRawTempView(ident.table).get), overrideIfExists = true)
    else if (ident.database.isEmpty && cat.getRawGlobalTempView(ident.table).isDefined)
      cat.createGlobalTempView(ident.table,
        restamp(cat.getRawGlobalTempView(ident.table).get), overrideIfExists = true)
    else {
      val meta = scala.util.Try(cat.getTableMetadata(ident)).getOrElse(
        throw new NoSuchElementException(
          s"no view '$viewName' in the catalog to attach a privacy policy to"))
      cat.alterTable(meta.copy(properties = f(meta.properties)))
    }
  }
}

final class PolicyViolationException(msg: String)
  extends org.apache.spark.sql.AnalysisException(
    errorClass = "_LEGACY_ERROR_TEMP_3100", messageParameters = Map("message" -> msg))

/** The one custom Catalyst rule this engine needs (SURVEY.md §4). Injected
  * post-resolution: at that point view references still appear as resolved
  * [[View]] nodes carrying their catalog metadata ([[View]] elimination
  * only happens in the optimizer), so policy views are identifiable by
  * their true catalog identity — name plus creation timestamp — and a
  * subquery alias that merely shares the name never triggers enforcement.
  *
  * For each policy-view reference, the NEAREST enclosing [[Aggregate]] is
  * rewritten from `Agg[groups, aggs]` to
  * `Project[aggs] <- Filter[count(DISTINCT unit) >= t] <- Agg[groups, aggs + cd]`
  * — the suppression predicate runs AFTER grouping, on the already-reduced
  * groups, so at scale it costs one extra distinct-count in the same
  * aggregation pass (no extra shuffle). A reference with no enclosing
  * aggregate anywhere fails analysis.
  *
  * Rewritten aggregates are marked with a [[TreeNodeTag]] (NOT by the shape
  * or names of their expressions): the query author is the adversary in the
  * clean-room threat model, and anything an author can type — such as an
  * alias spelled like an internal name — must not be able to impersonate a
  * completed rewrite. Author-written aliases using the reserved prefix over
  * a policy view are rejected outright. */
class AggregationThresholdRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import AggregationThresholdRule.{CdPrefix, PendingRef, ProtectedTag}

  override def apply(plan: LogicalPlan): LogicalPlan = applyWithEnv(plan, Map.empty)

  private def applyWithEnv(plan: LogicalPlan, cteEnv: CteEnv): LogicalPlan = {
    val (out, pending) = protectPlan(plan, cteEnv)
    if (pending.nonEmpty)
      throw new PolicyViolationException(
        s"view(s) ${pending.map(_.view).distinct.mkString(", ")} carry an aggregation " +
          "threshold privacy policy: queries must aggregate (no raw row access)")
    out
  }

  /** An unprotected policy-view reference: view name, its policy, and the
    * view's ACTUAL privacy-unit attribute — carried by exprId so that
    * enforcement counts the real column, never a same-named impostor the
    * query author aliased or joined into scope.
    *
    * `taint` is the set of attribute ids whose VALUES derive from the unit
    * column between the view and the enforcing aggregate: the unit attribute
    * itself plus every projection alias computed from a tainted input
    * (`customer_id AS cid2`, `concat(customer_id,'') AS c`, an exploded
    * array of it, ...). The aggregate whitelist consults this set — without
    * it, one rename below the aggregate would launder raw unit values into
    * a permitted `sum()`. */
  private type Pending = Seq[PendingRef]
  /** CTE id → (definition output, pending below that definition). */
  private type CteEnv = Map[Long, (Seq[Attribute], Pending)]

  /** Bottom-up walk returning the rewritten plan plus policy-view references
    * not yet covered by an enclosing Aggregate. `cteEnv` carries each CTE
    * definition's unprotected policy references to its reference sites, so
    * a policy view read through `WITH x AS (...)` is enforced at the
    * aggregate over `x`, exactly as if inlined. */
  private def protectPlan(p0: LogicalPlan, cteEnv: CteEnv): (LogicalPlan, Pending) = {
    // expression subqueries (scalar/IN/EXISTS) carry their own plans — each
    // is protected independently (a policy view cannot be read raw through
    // `SELECT (SELECT x FROM policy_view LIMIT 1)`), and the CURRENT cte
    // env travels in: a subquery reading an OUTER CTE of a policy view
    // must still see that CTE's policy
    val p = p0 match {
      case w: WithCTE => w // holds no expressions of its own
      case _ => p0.transformExpressions {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          s.withNewPlan(applyWithEnv(s.plan, cteEnv))
      }
    }
    p match {
      case w: WithCTE =>
        // definitions resolve in order; later ones may reference earlier ones
        var env = cteEnv
        val newDefs = w.cteDefs.map { d =>
          val (c2, pend) = protectPlan(d.child, env)
          env = env + (d.id -> ((d.child.output, pend)))
          d.copy(child = c2)
        }
        val (main, pendingMain) = protectPlan(w.plan, env)
        (w.copy(plan = main, cteDefs = newDefs), pendingMain)

      case r: CTERelationRef =>
        cteEnv.get(r.cteId) match {
          case Some((defOut, pend)) =>
            // the ref mints fresh attribute ids for the def's output —
            // remap each pending unit attribute (and its taint set)
            // positionally so the exprId trace survives the CTE boundary;
            // tainted ids not in the def's output cannot escape the CTE
            val remapped = pend.map { ref =>
              val i = defOut.indexWhere(_.exprId == ref.attr.exprId)
              val attr2 = if (i >= 0 && i < r.output.size) r.output(i) else ref.attr
              val taint2 = ref.taint.flatMap { id =>
                val j = defOut.indexWhere(_.exprId == id)
                if (j >= 0 && j < r.output.size) Some(r.output(j).exprId) else None
              }
              ref.copy(attr = attr2, taint = taint2 + attr2.exprId)
            }
            (r, remapped)
          case None => (r, Nil)
        }

      case v: View =>
        val (child, pending) = protectPlan(v.child, cteEnv)
        val bare = v.desc.identifier.table
        val name = v.desc.identifier.database.map(db => s"$db.$bare").getOrElse(bare)
        // the policy travels IN the view instance's own catalog properties
        // (for temp views: the registry entry's metadata) — it IS the view's
        // own declaration, so identity is physical, never name-matched
        val resolver = spark.sessionState.conf.resolver
        val here = PolicyCatalog.fromProperties(v.desc.properties)
          .map { pol =>
            val attr = v.output.find(a => resolver(a.name, pol.unitColumn)).getOrElse(
              throw new PolicyViolationException(
                s"policy view '$name' does not expose its privacy unit column '${pol.unitColumn}'"))
            PendingRef(name, pol, attr, Set(attr.exprId))
          }
        (v.withNewChildren(Seq(child)), pending ++ here)

      case a: Aggregate =>
        val (child, pending) = protectPlan(a.child, cteEnv)
        val a2 = a.withNewChildren(Seq(child)).asInstanceOf[Aggregate]
        if (pending.isEmpty) (a2, Nil)
        else if (a2.getTagValue(ProtectedTag).contains(true)) (a2, Nil) // re-analysis of our own rewrite
        else {
          val spoofed = a2.aggregateExpressions.collect {
            case al: Alias if al.name.startsWith(CdPrefix) => al.name
          }
          if (spoofed.nonEmpty)
            throw new PolicyViolationException(
              s"alias(es) ${spoofed.mkString(", ")} use the reserved privacy prefix " +
                s"'$CdPrefix' in a query over policy view(s) " +
                pending.map(_.view).distinct.mkString(", "))
          validateAggregates(a2, pending)
          (rewrite(a2, pending), Nil)
        }

      case other =>
        val results = other.children.map(protectPlan(_, cteEnv))
        val rebuilt =
          if (other.children.isEmpty) other else other.withNewChildren(results.map(_._1))
        val pending = results.flatMap(_._2)
        // Set operations that MERGE a policy view's rows with other row
        // sources are rejected outright: inside a later aggregate the
        // merged column would count attacker-supplied privacy units toward
        // the threshold, and the attacker can subtract their own known
        // contribution from the published aggregate — an inflation attack
        // the per-group distinct count cannot see. Joins stay allowed: a
        // join can duplicate or filter the view's unit values but never
        // fabricate new ones.
        rebuilt match {
          case (_: Union | _: Intersect | _: Except) if pending.nonEmpty =>
            throw new PolicyViolationException(
              s"set operations over policy view(s) ${pending.map(_.view).distinct.mkString(", ")} " +
                "are not allowed: aggregate the policy view directly")
          // Window functions over RAW policy rows are rejected: a window
          // aggregate is not an Aggregate node (no threshold gate fires),
          // and worse, `first_value(unit) OVER (...)` mints a fresh
          // attribute carrying raw unit VALUES that a later whitelisted
          // `sum()` would publish. Windows over the already-aggregated
          // (suppressed) result remain fine — pending is Nil there.
          case w: Window if pending.nonEmpty =>
            throw new PolicyViolationException(
              s"window functions over policy view(s) ${pending.map(_.view).distinct.mkString(", ")} " +
                "are not allowed before aggregation: aggregate the policy view first, " +
                "then window over the aggregated result")
          // taint propagation: a projection alias computed from a tainted
          // input carries unit-derived values under a fresh exprId
          case p: Project if pending.nonEmpty =>
            (p, pending.map(r => r.copy(taint = r.taint ++ derivedAliases(p.projectList, r.taint))))
          // a join whose CONDITION touches a tainted column makes the whole
          // other side unit-correlated: which of its rows survive (and how
          // often) is a function of the unit values, and worse, the author
          // controls that side's contents — `JOIN (SELECT id, pow(2,id) AS
          // enc FROM ...) l ON t.customer_id = l.id` then `sum(l.enc)`
          // publishes an exact bitmask of a group's unit ids through a
          // whitelisted aggregate. Forward taint cannot see `enc`'s
          // derivation (it happened in the untainted subtree), so the other
          // side's ENTIRE output is tainted — fail-closed. Joins on
          // non-unit keys are untouched, so ordinary enrichment still works.
          case jn: Join if pending.nonEmpty && jn.condition.isDefined =>
            val condIds = jn.condition.get.references.map(_.exprId).toSet
            val (leftPend, rightPend) = (results(0)._2, results(1)._2)
            val leftIds = jn.left.output.map(_.exprId).toSet
            val rightIds = jn.right.output.map(_.exprId).toSet
            def widen(ps: Pending, otherSide: Set[ExprId]) = ps.map { r =>
              if (condIds.exists(r.taint)) r.copy(taint = r.taint ++ otherSide) else r
            }
            (jn, widen(leftPend, rightIds) ++ widen(rightPend, leftIds))
          // explode/posexplode/inline of unit-derived input: the generator
          // output attrs carry unit-derived values
          case g: Generate if pending.nonEmpty &&
              g.generator.references.exists(a => pending.exists(_.taint(a.exprId))) =>
            (g, pending.map { r =>
              if (g.generator.references.exists(a => r.taint(a.exprId)))
                r.copy(taint = r.taint ++ g.generatorOutput.map(_.exprId))
              else r
            })
          case _ => (rebuilt, pending)
        }
    }
  }

  /** ExprIds of aliases in `list` whose value derives from any id in `taint`. */
  private def derivedAliases(list: Seq[NamedExpression], taint: Set[ExprId]): Set[ExprId] =
    list.collect {
      case al: Alias if al.child.references.exists(a => taint(a.exprId)) => al.exprId
    }.toSet

  /** The aggregate-function whitelist (the reference's
    * `aggregation_threshold_policy` restricts the permitted aggregate list —
    * BigQuery allows COUNT/COUNTIF/SUM/AVG over such views): the per-group
    * distinct-unit gate suppresses small groups, but a value-revealing
    * aggregate (`min(customer_id)`, `collect_list(...)`, `any_value(...)`)
    * or a targeted predicate (`sum(CASE WHEN customer_id=123 THEN fare END)`,
    * `count(*) FILTER (WHERE customer_id=123)`) leaks individual data from a
    * group that PASSES the threshold. Three checks, all fail-closed:
    *   1. only Count/CountIf/Sum/Average aggregate functions;
    *   2. no aggregate FILTER clause referencing a unit-derived column;
    *   3. the unit column (or anything derived from it — see `taint`)
    *      appears inside an aggregate only as a bare `count([DISTINCT] unit)`.
    * Grouping expressions MAY reference the unit: a group keyed on (a
    * function of) the unit column shrinks its own distinct-unit count and
    * self-suppresses, which is the documented BigQuery behavior. */
  private def validateAggregates(a: Aggregate, pending: Pending): Unit = {
    val taint: Set[ExprId] = pending.flatMap(_.taint).toSet
    val unitIds: Set[ExprId] = pending.map(_.attr.exprId).toSet
    val views = pending.map(_.view).distinct.mkString(", ")
    a.aggregateExpressions.foreach(_.foreach {
      case ae: AggregateExpression =>
        ae.aggregateFunction match {
          case _: Count | _: CountIf | _: Sum | _: Average => ()
          case f => throw new PolicyViolationException(
            s"aggregate function '${f.prettyName}' is not allowed over policy view(s) " +
              s"$views: only count/count_if/sum/avg are permitted (value-revealing " +
              "aggregates such as min/max/first/any_value/collect_list/percentile " +
              "can emit raw privacy-unit-holder data)")
        }
        if (ae.filter.exists(_.references.exists(r => taint(r.exprId))))
          throw new PolicyViolationException(
            s"aggregate FILTER predicates over policy view(s) $views may not reference " +
              "the privacy unit column: a unit-targeted filter isolates an individual " +
              "inside a group that passes the threshold")
        val isBareUnitCount = ae.aggregateFunction match {
          case Count(Seq(attr: Attribute)) if unitIds(attr.exprId) => true
          case _ => false
        }
        if (!isBareUnitCount &&
            ae.aggregateFunction.references.exists(r => taint(r.exprId)))
          throw new PolicyViolationException(
            s"the privacy unit column of policy view(s) $views (or a column derived " +
              "from it) may appear in an aggregate only as count([DISTINCT] unit); " +
              "any other use — sum/avg over it, inside CASE or other expressions — " +
              "can reveal individual unit values")
      case _ => ()
    })
  }

  private def rewrite(a: Aggregate, pending: Pending): LogicalPlan = {
    // one distinct-count per distinct privacy-unit ATTRIBUTE (exprId, not
    // name), max threshold wins
    val byUnit = pending.groupBy(_.attr.exprId).map { case (_, ps) =>
      (ps.head.attr, ps.map(_.policy.threshold).max, ps.head.view)
    }.toSeq
    val cds: Seq[(Alias, Int)] = byUnit.zipWithIndex.map { case ((attr, t, viewName), i) =>
      // the view's REAL unit attribute must reach this aggregate: a
      // same-named column the author aliased over it (or joined into
      // scope) has a different exprId and cannot stand in for it —
      // resolving by name here would let `SELECT trip_id AS customer_id`
      // inflate the distinct count and unsuppress a protected group
      if (!a.child.output.exists(_.exprId == attr.exprId))
        throw new PolicyViolationException(
          s"privacy unit column '${attr.name}' of policy view '$viewName' is not " +
            "available below the aggregate (it must be selected through " +
            "unchanged — not renamed, shadowed or dropped)")
      (Alias(Count(attr).toAggregateExpression(isDistinct = true), s"$CdPrefix$i")(), t)
    }
    val widened = a.copy(aggregateExpressions = a.aggregateExpressions ++ cds.map(_._1))
    widened.setTagValue(ProtectedTag, true)
    val cond: Expression = cds
      .map { case (al, t) => GreaterThanOrEqual(al.toAttribute, Literal(t.toLong)) }
      .reduce[Expression](And(_, _))
    val visible: Seq[NamedExpression] = a.aggregateExpressions.map(_.toAttribute)
    Project(visible, Filter(cond, widened))
  }
}

object AggregationThresholdRule {
  /** See the `taint` doc at the use site in [[AggregationThresholdRule]]. */
  private[privacy] final case class PendingRef(view: String,
      policy: AggregationThresholdPolicy, attr: Attribute, taint: Set[ExprId])

  /** Marks an [[Aggregate]] the rule itself widened — tags live outside the
    * expression tree, so no user-authored SQL can forge one. Catalyst copies
    * tags across `withNewChildren`/transform, so the mark survives
    * re-analysis of composed Datasets. */
  private[privacy] val ProtectedTag: TreeNodeTag[Boolean] =
    TreeNodeTag[Boolean]("graft.privacy.aggregationThresholdProtected")

  /** Reserved alias prefix for the injected distinct-counts; user queries
    * over policy views may not use it (anti-spoofing). */
  private[privacy] val CdPrefix = "__privacy_cd_"
}

/** `SparkSessionExtensions` entry point — wire with
  * `.config("spark.sql.extensions", "graft.privacy.GraftExtensions")`
  * (done by [[graft.GraftSession]]). Installs the privacy rule and the
  * engine's native SQL functions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal}
  import graft.functions.expressions.{DotProduct, IntersectSize, MinHashSignature, NearestCentroid, RepetitionStats, Shingles, SimHash16, Winnow, ZOrder}

  override def apply(ext: SparkSessionExtensions): Unit = {
    // authorization (WHO) before policy (HOW): a rejected principal learns
    // nothing about the view's policy shape from the error it gets
    ext.injectPostHocResolutionRule(s => new ViewAclRule(s))
    ext.injectPostHocResolutionRule(s => new AggregationThresholdRule(s))
    ext.injectPostHocResolutionRule(s => new JoinRestrictionRule(s))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_nearest_centroid"),
      new ExpressionInfo(classOf[NearestCentroid].getName, "graft_nearest_centroid"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        NearestCentroid(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Shingles].getName, "graft_shingles"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        args(1) match {
          case Literal(n: Int, _) => Shingles(args(0), n)
          case other => throw new IllegalArgumentException(
            s"graft_shingles(arr, n): n must be an integer literal, got $other")
        }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash16].getName, "graft_simhash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        args match {
          case Seq(toks) => SimHash16(toks)
          case Seq(toks, Literal(b: Int, _)) =>
            graft.functions.expressions.SimHashWide(toks, b)
          case other => throw new IllegalArgumentException(
            s"graft_simhash(toks[, bits]): bits must be an integer literal, " +
              s"got ${other.mkString("(", ", ", ")")}")
        }))
    ext.injectFunction((
      FunctionIdentifier("graft_intersect_size"),
      new ExpressionInfo(classOf[IntersectSize].getName, null, "graft_intersect_size",
        "graft_intersect_size(a, b) - |a ∩ b| via merge scan. PRECONDITION: both " +
          "array<bigint> args SORTED ASCENDING with distinct NON-NULL elements " +
          "(e.g. via sort_array over null-free input); unsorted input silently " +
          "undercounts, and null elements are rejected at analysis time.",
        "", "", "", "", "", "", ""),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        IntersectSize(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[Winnow].getName, "graft_winnow"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        args match {
          case Seq(text, Literal(k: Int, _), Literal(w: Int, _)) => Winnow(text, k, w)
          case other => throw new IllegalArgumentException(
            s"graft_winnow(text, k, w): expects exactly 3 args with integer-literal " +
              s"k and w, got ${other.mkString("(", ", ", ")")}")
        }))
    ext.injectFunction((
      FunctionIdentifier("graft_zorder"),
      new ExpressionInfo(classOf[ZOrder].getName, null, "graft_zorder",
        "graft_zorder(a, b) - Morton interleave of the low 31 bits of two " +
          "bigint keys; sort/range-partition by it for multi-dimensional " +
          "min/max file pruning. Wider keys should be pre-scaled.",
        "", "", "", "", "", "", ""),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ZOrder(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_repetition"),
      new ExpressionInfo(classOf[RepetitionStats].getName, null, "graft_repetition",
        "graft_repetition(tokens) - one-pass per-row repetition stats struct " +
          "(token/2-gram top frequency, duplicate 3-grams) for Gopher-style " +
          "quality gates; tokens must be array<string> with non-null elements.",
        "", "", "", "", "", "", ""),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RepetitionStats(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_char_counts"),
      new ExpressionInfo(classOf[graft.functions.expressions.CharCounts].getName, null,
        "graft_char_counts",
        "graft_char_counts(text) - one-pass 27-slot histogram of a-z " +
          "(case-insensitive) and space over ASCII text, as array<bigint>.",
        "", "", "", "", "", "", ""),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.expressions.CharCounts(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_byte_energy"),
      new ExpressionInfo(classOf[graft.functions.expressions.ByteEnergy].getName, null,
        "graft_byte_energy",
        "graft_byte_energy(bytes) - sum of unsigned byte values of a binary " +
          "column (stub frame energy for the VAD segmentation pass), one " +
          "codegen'd O(bytes) loop.",
        "", "", "", "", "", "", ""),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.expressions.ByteEnergy(args(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[graft.functions.expressions.TopK].getName, null, "graft_topk",
        "graft_topk(score, id, k) - bounded-state grouped top-K aggregate: " +
          "keeps the k largest (score DESC, id ASC) bigint pairs per group " +
          "with partial merge (<= k-sized states cross the shuffle), " +
          "returning array<struct<score, id>> sorted in that order.",
        "", "", "", "", "", "", ""),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        args match {
          case Seq(score, id, Literal(k: Int, _)) =>
            graft.functions.expressions.TopK(score, id, k).toAggregateExpression()
          case other => throw new IllegalArgumentException(
            s"graft_topk(score, id, k): expects 3 args with integer-literal k, " +
              s"got ${other.mkString("(", ", ", ")")}")
        }))
    ext.injectFunction((
      FunctionIdentifier("graft_md5_lanes"),
      new ExpressionInfo(classOf[graft.functions.expressions.Md5Lanes].getName, null,
        "graft_md5_lanes",
        "graft_md5_lanes(g, H) - all H md5 MinHash lane values of one " +
          "string in one pass: lane j = first 15 hex digits of " +
          "md5('<j>:' || g) as a base-16 number (top 60 digest bits).",
        "", "", "", "", "", "", ""),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        args match {
          case Seq(g, Literal(h: Int, _)) =>
            graft.functions.expressions.Md5Lanes(g, h)
          case other => throw new IllegalArgumentException(
            s"graft_md5_lanes(g, H): H must be an integer literal, " +
              s"got ${other.mkString("(", ", ", ")")}")
        }))
    ext.injectFunction((
      FunctionIdentifier("graft_avro_encode"),
      new ExpressionInfo(classOf[graft.functions.expressions.AvroEncode].getName, null,
        "graft_avro_encode",
        "graft_avro_encode(struct, schemaJson) - serialize one struct row " +
          "to a single Avro binary record under the string-literal wire " +
          "schema (the per-message topic encoding); pass the SAME literal " +
          "to graft_avro_decode.",
        "", "", "", "", "", "", ""),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        args match {
          case Seq(data, Literal(s, org.apache.spark.sql.types.StringType)) if s != null =>
            graft.functions.expressions.AvroEncode(data, s.toString)
          case other => throw new IllegalArgumentException(
            s"graft_avro_encode(struct, schemaJson): schemaJson must be a " +
              s"string literal, got ${other.mkString("(", ", ", ")")}")
        }))
    ext.injectFunction((
      FunctionIdentifier("graft_avro_decode"),
      new ExpressionInfo(classOf[graft.functions.expressions.AvroDecode].getName, null,
        "graft_avro_decode",
        "graft_avro_decode(bytes, schemaJson) - decode one Avro binary " +
          "record under the string-literal writer schema back to its " +
          "struct; malformed bytes throw (FAILFAST).",
        "", "", "", "", "", "", ""),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        args match {
          case Seq(data, Literal(s, org.apache.spark.sql.types.StringType)) if s != null =>
            graft.functions.expressions.AvroDecode(data, s.toString)
          case other => throw new IllegalArgumentException(
            s"graft_avro_decode(bytes, schemaJson): schemaJson must be a " +
              s"string literal, got ${other.mkString("(", ", ", ")")}")
        }))
    ext.injectFunction((
      FunctionIdentifier("graft_ahash"),
      new ExpressionInfo(classOf[graft.functions.expressions.AHash].getName, null,
        "graft_ahash",
        "graft_ahash(bytes) - 64-bit perceptual average-hash of opaque " +
          "media content: integer average-pool into 64 cells, bit i = " +
          "cell_i > global mean (stub decode; see PerceptualHashExpr).",
        "", "", "", "", "", "", ""),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.expressions.AHash(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_dhash"),
      new ExpressionInfo(classOf[graft.functions.expressions.DHash].getName, null,
        "graft_dhash",
        "graft_dhash(bytes) - 64-bit perceptual difference-hash: same 64 " +
          "pooled cells as graft_ahash, bit i = cell_i > cell_(i+1 mod 64) " +
          "(circular gradient sign).",
        "", "", "", "", "", "", ""),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.expressions.DHash(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_media_rendition"),
      new ExpressionInfo(classOf[graft.functions.expressions.MediaRendition].getName, null,
        "graft_media_rendition",
        "graft_media_rendition(bytes, mode) - deterministic stub re-encode " +
          "of media content: 0 = identity, 1 = re-exposure (+1 every byte, " +
          "hash-invariant), 2 = quantization noise (+1 every 16th byte).",
        "", "", "", "", "", "", ""),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.expressions.MediaRendition(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        args(1) match {
          case Literal(n: Int, _) => MinHashSignature(args(0), n)
          case other => throw new IllegalArgumentException(
            s"graft_minhash(arr, n): n must be an integer literal, got $other")
        }))
  }
}
