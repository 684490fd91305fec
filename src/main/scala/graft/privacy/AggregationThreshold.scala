package graft.privacy

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Expression, GreaterThanOrEqual, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, CTERelationDef, CTERelationRef, Except, Filter, Intersect, LogicalPlan, Project, Union, View, WithCTE}
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

/** A policy bound to one view INSTANCE: `viewCreateTime` is the catalog
  * creation timestamp of the view at registration time. A later
  * `CREATE OR REPLACE` mints a fresh catalog entry with a fresh createTime,
  * so a stale policy no longer matches — replacing a view without
  * re-declaring its policy drops the policy, exactly as BigQuery's
  * view-OPTIONS semantics do (options not restated are gone). */
private[privacy] final case class BoundPolicy(
    policy: AggregationThresholdPolicy, viewCreateTime: Long)

/** Session-global registry of policy-bearing views. Driver-side
  * control-plane metadata (a few entries), like the schema registry.
  *
  * Policies are scoped to the RESOLVED view identity (name + catalog
  * createTime), never to a bare name: a subquery alias that happens to
  * share a policy view's name is not a view and is never enforced against,
  * and a re-created view does not inherit the policy of its predecessor. */
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

  private val policies = new ConcurrentHashMap[String, BoundPolicy]()

  /** Attach a policy to an EXISTING view (temp, global-temp or catalog).
    * Registration resolves the view's creation timestamp so enforcement can
    * later prove it is looking at the same view instance. */
  def setPolicy(spark: SparkSession, viewName: String,
                policy: AggregationThresholdPolicy): Unit = {
    val ct = viewCreateTime(spark, viewName).getOrElse(throw new NoSuchElementException(
      s"no view '$viewName' in the catalog to attach a privacy policy to"))
    policies.put(viewName.toLowerCase, BoundPolicy(policy, ct))
  }

  def removePolicy(viewName: String): Unit = { policies.remove(viewName.toLowerCase); () }

  /** Policy for one resolved view occurrence — name AND creation instant
    * must match (see class doc). */
  def policyFor(viewName: String, viewCreateTime: Long): Option[AggregationThresholdPolicy] =
    Option(policies.get(viewName.toLowerCase))
      .filter(_.viewCreateTime == viewCreateTime).map(_.policy)

  def clear(): Unit = policies.clear()

  private def viewCreateTime(spark: SparkSession, name: String): Option[Long] = {
    val cat = spark.sessionState.catalog
    val ident = graft.util.Names.parseTableIdentifier(spark, name)
    (if (ident.database.isEmpty)
       cat.getRawTempView(ident.table).map(_.tableMeta.createTime)
         .orElse(cat.getRawGlobalTempView(ident.table).map(_.tableMeta.createTime))
     else None)
      .orElse(scala.util.Try(cat.getTableMetadata(ident).createTime).toOption)
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

  import AggregationThresholdRule.{CdPrefix, ProtectedTag}

  override def apply(plan: LogicalPlan): LogicalPlan = applyWithEnv(plan, Map.empty)

  private def applyWithEnv(plan: LogicalPlan, cteEnv: CteEnv): LogicalPlan = {
    val (out, pending) = protectPlan(plan, cteEnv)
    if (pending.nonEmpty)
      throw new PolicyViolationException(
        s"view(s) ${pending.map(_._1).distinct.mkString(", ")} carry an aggregation " +
          "threshold privacy policy: queries must aggregate (no raw row access)")
    out
  }

  /** An unprotected policy-view reference: view name, its policy, and the
    * view's ACTUAL privacy-unit attribute — carried by exprId so that
    * enforcement counts the real column, never a same-named impostor the
    * query author aliased or joined into scope. */
  private type Pending = Seq[(String, AggregationThresholdPolicy, Attribute)]
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
            // remap each pending unit attribute positionally so the exprId
            // trace survives the CTE boundary
            val remapped = pend.map { case (n, pol, attr) =>
              val i = defOut.indexWhere(_.exprId == attr.exprId)
              (n, pol, if (i >= 0 && i < r.output.size) r.output(i) else attr)
            }
            (r, remapped)
          case None => (r, Nil)
        }

      case v: View =>
        val (child, pending) = protectPlan(v.child, cteEnv)
        val bare = v.desc.identifier.table
        val qualified = v.desc.identifier.database.map(db => s"$db.$bare")
        // a policy travels either IN the view's own catalog properties
        // (durable views — checked first, it IS the view instance's own
        // declaration) or in the in-memory PolicyCatalog under the bare or
        // qualified name, instance-matched by createTime
        val names = qualified.toSeq :+ bare
        val resolver = spark.sessionState.conf.resolver
        val here = PolicyCatalog.fromProperties(v.desc.properties)
          .map(qualified.getOrElse(bare) -> _)
          .orElse(names.view
            .flatMap(n => PolicyCatalog.policyFor(n, v.desc.createTime).map(n -> _))
            .headOption)
          .map { case (n, pol) =>
            val attr = v.output.find(a => resolver(a.name, pol.unitColumn)).getOrElse(
              throw new PolicyViolationException(
                s"policy view '$n' does not expose its privacy unit column '${pol.unitColumn}'"))
            (n, pol, attr)
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
                pending.map(_._1).distinct.mkString(", "))
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
              s"set operations over policy view(s) ${pending.map(_._1).distinct.mkString(", ")} " +
                "are not allowed: aggregate the policy view directly")
          case _ => (rebuilt, pending)
        }
    }
  }

  private def rewrite(a: Aggregate, pending: Pending): LogicalPlan = {
    // one distinct-count per distinct privacy-unit ATTRIBUTE (exprId, not
    // name), max threshold wins
    val byUnit = pending.groupBy(_._3.exprId).map { case (_, ps) =>
      (ps.head._3, ps.map(_._2.threshold).max, ps.head._1)
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
  import graft.functions.expressions.{DotProduct, MinHashSignature, NearestCentroid, Shingles, SimHash16}

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(s => new AggregationThresholdRule(s))
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
        SimHash16(args(0))))
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
