package graft.privacy

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo, ExprId, Expression, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, CTERelationRef, Except, Filter, Generate, Intersect, Join, LogicalPlan, Project, Union, View, Window, WithCTE}
import org.apache.spark.sql.catalyst.rules.Rule

/** Join-restriction policy for a view — the THIRD clean-room primitive
  * alongside the aggregation threshold (q22) and column masking (q167):
  * BigQuery analysis rules' `join_restriction_policy`, the sharing pattern
  * around `/root/reference/sql/sp_demo_cleanroom.sql:51-63`. The publisher
  * declares which columns of a shared view may serve as JOIN KEYS; the
  * subscriber may link the view to their own data only through those
  * columns, so arbitrary-key linkage attacks (joining on quasi-identifiers
  * such as balance, date or name fragments) are rejected at analysis time.
  *
  * Modes, matching the documented BigQuery condition types:
  *  - `JOIN_BLOCKED`      — the view may never participate in a join;
  *  - `JOIN_ANY`          — a join is REQUIRED to query the view, and at
  *                          least one allowed column must be a join key;
  *  - `JOIN_ALL`          — a join is required and EVERY allowed column
  *                          must appear among that join's keys;
  *  - `JOIN_NOT_REQUIRED` — raw queries are fine, but any join the view
  *                          does participate in must key on allowed columns.
  *
  * Enforcement is FAIL-CLOSED, the q22 adversarial discipline:
  *  - a join key must be the view's own allowed-column ATTRIBUTE (exprId-
  *    exact, selected through unchanged) in a bare equality with an
  *    expression untainted by the view — `upper(allowed) = x`, casts,
  *    renames (`SELECT allowed AS k` then join on `k`) and non-equi
  *    comparisons are all rejected, because an expression-wrapped or
  *    re-derived key is a different linkage function than the declared one;
  *  - every OTHER join conjunct touching any view-derived column is
  *    rejected (it would smuggle a disallowed column into the linkage);
  *  - a Filter mixing view-derived columns with other relations' columns is
  *    held to the same rule — `CROSS JOIN t ... WHERE v.secret = t.k` and a
  *    correlated `EXISTS (... WHERE v.secret = outer.k)` are joins in
  *    disguise and are validated as joins (an allowed-column correlation
  *    counts toward JOIN_ANY/JOIN_ALL's join requirement);
  *  - set operations merging the view's rows with other sources are
  *    rejected outright (they would re-key the view's values under foreign
  *    attribute ids, out of this rule's sight — the same reason the
  *    aggregation-threshold rule rejects them).
  *
  * The rule only VALIDATES — it never rewrites the plan, so a legal query's
  * physical plan (pushdown, pruning, join strategy) is untouched. */
sealed abstract class JoinConditionMode(val name: String)
object JoinConditionMode {
  case object Blocked     extends JoinConditionMode("JOIN_BLOCKED")
  case object JoinAny     extends JoinConditionMode("JOIN_ANY")
  case object JoinAll     extends JoinConditionMode("JOIN_ALL")
  case object NotRequired extends JoinConditionMode("JOIN_NOT_REQUIRED")
  val all: Seq[JoinConditionMode] = Seq(Blocked, JoinAny, JoinAll, NotRequired)
  /** FAIL-CLOSED parse: an unknown mode string is a policy the author
    * intended — treating it as "no policy" would leave the view freely
    * joinable. */
  def parse(s: String): JoinConditionMode =
    all.find(_.name == s).getOrElse(throw new PolicyViolationException(
      s"unknown join restriction mode '$s' (expected one of ${all.map(_.name).mkString(", ")})"))
}

final case class JoinRestrictionPolicy(mode: JoinConditionMode,
    allowedColumns: Seq[String]) {
  require(mode == JoinConditionMode.Blocked || allowedColumns.nonEmpty,
    s"${mode.name} requires at least one allowed join column")
}

object JoinRestrictionCatalog {
  /** View TBLPROPERTIES keys — same persistence model as the aggregation
    * threshold ([[PolicyCatalog]]): the policy lives IN the view instance's
    * own metadata and dies with any CREATE OR REPLACE that omits it. */
  val ModeProp = "graft.privacy.joinCondition"
  val ColsProp = "graft.privacy.joinAllowedColumns"

  /** FAIL-CLOSED on misdeclaration, like [[PolicyCatalog.fromProperties]]. */
  def fromProperties(props: Map[String, String]): Option[JoinRestrictionPolicy] =
    (props.get(ModeProp), props.get(ColsProp)) match {
      case (Some(m), Some(c)) =>
        val cols = c.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        Some(JoinRestrictionPolicy(JoinConditionMode.parse(m), cols))
      case (Some(m), None) if m == JoinConditionMode.Blocked.name =>
        Some(JoinRestrictionPolicy(JoinConditionMode.Blocked, Nil))
      case (None, None) => None
      case (m, c) => throw new PolicyViolationException(
        s"incomplete join restriction policy on view: $ModeProp=${m.getOrElse("<missing>")}, " +
          s"$ColsProp=${c.getOrElse("<missing>")} — a non-BLOCKED mode requires both")
    }

  def setPolicy(spark: SparkSession, viewName: String,
                policy: JoinRestrictionPolicy): Unit = {
    policy.allowedColumns.foreach(c => require(c.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"allowed join column must be a plain identifier, got '$c'"))
    PolicyCatalog.updatePropertiesOf(spark, viewName,
      _ + (ModeProp -> policy.mode.name) +
        (ColsProp -> policy.allowedColumns.mkString(",")))
  }

  def removePolicy(spark: SparkSession, viewName: String): Unit =
    try PolicyCatalog.updatePropertiesOf(spark, viewName, _ - ModeProp - ColsProp)
    catch { case _: NoSuchElementException => () }
}

class JoinRestrictionRule(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  /** An in-scope join-restricted view reference.
    * `allowed`: the view's REAL allowed-column attributes by exprId (name
    * resolution happened once, at the View node — everything after is
    * id-exact). `taint`: ids whose VALUES derive from ANY view column (the
    * whole view output plus downstream aliases — the aggregation rule's
    * taint discipline). `joined`: whether an allowed-key join has already
    * linked this reference (satisfies JOIN_ANY/JOIN_ALL's requirement). */
  private final case class JPending(view: String, policy: JoinRestrictionPolicy,
      allowed: Map[ExprId, String], taint: Set[ExprId], joined: Boolean)
  private type Pending = Seq[JPending]
  private type CteEnv = Map[Long, (Seq[Attribute], Pending)]

  override def apply(plan: LogicalPlan): LogicalPlan = {
    checkRequired(validate(plan, Map.empty))
    plan // validation only — never rewrites
  }

  /** Root-of-plan check: JOIN_ANY/JOIN_ALL make the join REQUIRED. */
  private def checkRequired(pending: Pending): Unit =
    pending.filter(p => !p.joined && (p.policy.mode == JoinConditionMode.JoinAny ||
        p.policy.mode == JoinConditionMode.JoinAll)) match {
      case Nil => ()
      case ps => throw new PolicyViolationException(
        s"view(s) ${ps.map(_.view).distinct.mkString(", ")} carry a " +
          s"${ps.head.policy.mode.name} join restriction: the query must join the view " +
          s"on allowed column(s) ${ps.head.policy.allowedColumns.mkString(", ")}")
    }

  /** Bottom-up walk returning the join-restricted references in scope at
    * each point. Mirrors the aggregation rule's CTE env so a view read
    * through `WITH x AS (...)` stays restricted at x's use sites. */
  private def validate(p0: LogicalPlan, cteEnv: CteEnv): Pending = {
    // expression subqueries validate independently: a correlated predicate
    // inside acts as a join (handled by the Filter case below via
    // outer-attribute detection), and the subquery's own join requirement
    // must hold within the subquery (its rows never surface raw)
    p0 match {
      case _: WithCTE => ()
      case _ => p0.expressions.foreach(_.foreach {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
          checkRequired(validate(s.plan, cteEnv))
        case _ => ()
      })
    }
    p0 match {
      case w: WithCTE =>
        var env = cteEnv
        w.cteDefs.foreach { d =>
          val pend = validate(d.child, env)
          env = env + (d.id -> ((d.child.output, pend)))
        }
        validate(w.plan, env)

      case r: CTERelationRef =>
        cteEnv.get(r.cteId) match {
          case Some((defOut, pend)) =>
            pend.map { ref =>
              def remap(ids: Set[ExprId]): Set[ExprId] = ids.flatMap { id =>
                val j = defOut.indexWhere(_.exprId == id)
                if (j >= 0 && j < r.output.size) Some(r.output(j).exprId) else None
              }
              val allowed2 = ref.allowed.flatMap { case (id, n) =>
                val j = defOut.indexWhere(_.exprId == id)
                if (j >= 0 && j < r.output.size) Some(r.output(j).exprId -> n) else None
              }
              ref.copy(allowed = allowed2, taint = remap(ref.taint))
            }
          case None => Nil
        }

      case v: View =>
        val below = validate(v.child, cteEnv)
        val bare = v.desc.identifier.table
        val name = v.desc.identifier.database.map(db => s"$db.$bare").getOrElse(bare)
        val resolver = spark.sessionState.conf.resolver
        val here = JoinRestrictionCatalog.fromProperties(v.desc.properties).map { pol =>
          val allowed = pol.allowedColumns.map { c =>
            val attr = v.output.find(a => resolver(a.name, c)).getOrElse(
              throw new PolicyViolationException(
                s"join-restricted view '$name' does not expose allowed join column '$c'"))
            attr.exprId -> attr.name
          }.toMap
          JPending(name, pol, allowed, v.output.map(_.exprId).toSet, joined = false)
        }
        below ++ here.toSeq

      case jn: Join =>
        val leftPend = validate(jn.left, cteEnv)
        val rightPend = validate(jn.right, cteEnv)
        val pending = leftPend ++ rightPend
        if (pending.isEmpty) Nil
        else {
          pending.foreach { p =>
            if (p.policy.mode == JoinConditionMode.Blocked)
              throw new PolicyViolationException(
                s"view '${p.view}' carries a JOIN_BLOCKED restriction: it may not " +
                  "participate in any join")
          }
          // a condition-less Join (explicit CROSS JOIN, or a comma join whose
          // predicate sits in a Filter above) introduces no linkage function
          // by itself — the Filter case validates any smuggled key above,
          // and checkRequired still demands a real allowed-key join for
          // JOIN_ANY/JOIN_ALL
          val conjuncts =
            jn.condition.map(splitConjunctivePredicates).getOrElse(Nil)
          pending.map(p => validateAsJoin(p, conjuncts,
            context = s"join condition ${jn.condition.map(_.sql).getOrElse("<none>")}"))
        }

      case f: Filter =>
        val pending = validate(f.child, cteEnv)
        // a predicate mixing view-derived columns with attributes the view
        // did NOT produce (another relation's columns above a join, or an
        // outer query's correlation — outer refs are never in the taint) is
        // a join in disguise: `CROSS JOIN t ... WHERE v.secret = t.k` and
        // correlated `EXISTS (... WHERE v.secret = outer.k)` both land
        // here. Literal-only view predicates (`v.col > 5`) pass untouched.
        pending.map { p =>
          val caught = splitConjunctivePredicates(f.condition).filter { c =>
            // an OuterReference is a foreign column too (its `references`
            // set is empty by design — it names the OUTER query's column),
            // so a correlated `v.col = outer.k` is caught exactly like a
            // post-join `v.col = t.k`
            val refs = c.references.toSeq
            val hasOuter = c.exists {
              case _: org.apache.spark.sql.catalyst.expressions.OuterReference => true
              case _ => false
            }
            refs.exists(a => p.taint(a.exprId)) &&
              (hasOuter || refs.exists(a => !p.taint(a.exprId)))
          }
          if (caught.isEmpty) p
          else validateAsJoin(p, caught, context = s"filter ${f.condition.sql}")
        }

      case pr: Project =>
        val pending = validate(pr.child, cteEnv)
        pending.map(p => p.copy(taint = p.taint ++ derived(pr.projectList, p.taint)))

      case a: Aggregate =>
        val pending = validate(a.child, cteEnv)
        pending.map(p => p.copy(taint = p.taint ++ derived(a.aggregateExpressions, p.taint)))

      case w: Window =>
        val pending = validate(w.child, cteEnv)
        pending.map(p => p.copy(taint = p.taint ++ derived(w.windowExpressions, p.taint)))

      case g: Generate =>
        val pending = validate(g.child, cteEnv)
        pending.map { p =>
          if (g.generator.references.exists(a => p.taint(a.exprId)))
            p.copy(taint = p.taint ++ g.generatorOutput.map(_.exprId))
          else p
        }

      case other =>
        val pending = other.children.flatMap(validate(_, cteEnv))
        other match {
          case (_: Union | _: Intersect | _: Except) if pending.nonEmpty =>
            throw new PolicyViolationException(
              s"set operations over join-restricted view(s) " +
                s"${pending.map(_.view).distinct.mkString(", ")} are not allowed: they " +
                "re-key the view's values under foreign column identities")
          case _ => pending
        }
    }
  }

  /** Validate a set of conjuncts as a join touching pending view `p`:
    * every conjunct referencing a view-derived column must be a bare
    * equality `allowedAttr = <untainted expr>`; JOIN_ALL additionally
    * requires every allowed column among the keys. Returns `p` with its
    * `joined` flag updated. */
  private def validateAsJoin(p: JPending, conjuncts: Seq[Expression],
      context: String): JPending = {
    var used = Set.empty[ExprId]
    conjuncts.foreach { c =>
      val touches = c.references.exists(a => p.taint(a.exprId))
      if (touches) c match {
        case EqualTo(l: Attribute, r) if p.allowed.contains(l.exprId) &&
            !r.references.exists(a => p.taint(a.exprId)) => used += l.exprId
        case EqualTo(l, r: Attribute) if p.allowed.contains(r.exprId) &&
            !l.references.exists(a => p.taint(a.exprId)) => used += r.exprId
        case _ => throw new PolicyViolationException(
          s"view '${p.view}' restricts join keys to " +
            s"(${p.policy.allowedColumns.mkString(", ")}): predicate '${c.sql}' in $context " +
            "links the view through a disallowed, derived or expression-wrapped column " +
            "(allowed keys must be the view's own columns, selected through unchanged, " +
            "in a bare equality)")
      }
    }
    if (p.policy.mode == JoinConditionMode.JoinAll && used.nonEmpty &&
        !p.allowed.keySet.subsetOf(used))
      throw new PolicyViolationException(
        s"view '${p.view}' carries a JOIN_ALL restriction: the join must key on ALL of " +
          s"(${p.policy.allowedColumns.mkString(", ")}); $context keys on " +
          s"(${used.map(p.allowed).mkString(", ")}) only")
    if (used.nonEmpty) p.copy(joined = true) else p
  }

  private def derived(list: Seq[NamedExpression], taint: Set[ExprId]): Set[ExprId] =
    list.collect {
      case al: Alias if al.child.references.exists(a => taint(a.exprId)) => al.exprId
    }.toSet
}
