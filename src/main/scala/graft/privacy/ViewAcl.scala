package graft.privacy

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, View}
import org.apache.spark.sql.catalyst.rules.Rule

/** View-level authorization — the WHO axis of the clean room, next to the
  * policy rules' HOW (aggregation threshold, join restriction, masking,
  * DP). The reference binds IAM principals to the shared surface
  * (`/root/reference/terraform/main.tf:437-440` grants the subscription's
  * writer `roles/bigquery.dataEditor`; the clean-room walkthrough at
  * `/root/reference/sql/sp_demo_cleanroom.sql:20-27` presumes distinct
  * publisher/subscriber principals) — without a principal check, any
  * session may query any policy view and the policy rules only shape WHAT
  * it sees. This module closes that: a view may carry an access-control
  * list of principals, and a session reads the view only when its declared
  * principal is on the list.
  *
  * Design mirrors [[PolicyCatalog]] exactly — the ACL is stamped INTO the
  * view instance's own catalog properties, never a side registry:
  *   - `CREATE OR REPLACE` mints a fresh relation without the properties,
  *     so replacing a view without re-granting DROPS the ACL (BigQuery's
  *     authorized-view model behaves the same way: authorization is on the
  *     view object);
  *   - a subquery alias sharing the view's name is not a [[View]] node and
  *     carries no properties — never enforced against;
  *   - enforcement composes with the policy rules: authorization is checked
  *     first (a rejected principal's QUERY returns nothing, not even whether
  *     the view aggregates — see "Scope of concealment" below for the
  *     metadata-command caveat), then the surviving plan still passes the
  *     aggregation-threshold / join-restriction walks.
  *
  * The caller's identity is session-tagged (`spark.graft.principal` in the
  * session conf — the seam where a real deployment injects its
  * authenticated identity; on a multi-tenant cluster each SparkSession is
  * one principal). Enforcement is analysis-time only: zero runtime cost,
  * and a denial is an [[PolicyViolationException]] before any task runs.
  *
  * TRUST BOUNDARY — what this rule does and does not defend: the principal
  * is an ordinary session conf, and nothing here prevents the query author
  * from running `SET spark.graft.principal=alice`. Within this package's
  * own threat model ("the query author is the adversary") the ACL is
  * therefore NOT a defense by itself — it is the enforcement half of a
  * deployment where the session broker sets the conf from an authenticated
  * identity and the SQL gateway strips `SET` on the `spark.graft.*`
  * namespace (exactly as a real cluster injects, and pins, its IAM
  * identity). ViewAclSpec pins the current behavior (a SQL `SET` IS
  * honored) so the boundary stays explicit rather than assumed.
  *
  * Scope of concealment: a rejected principal learns nothing FROM QUERY
  * RESULTS — not even whether the view aggregates — because denial
  * precedes the policy rules. Metadata commands (`SHOW CREATE TABLE`,
  * `DESCRIBE EXTENDED`, `SHOW TBLPROPERTIES`) contain no [[View]] node and
  * are not intercepted: the view's SQL text and policy properties remain
  * catalog-readable, as they are in BigQuery's authorized-view model
  * (authorization gates the DATA, catalog metadata visibility is governed
  * separately).
  *
  * Semantics:
  *   - no ACL property on the view → the view is not access-controlled
  *     (authorization is opt-in per view, like every policy here);
  *   - ACL present → the session principal must be set AND on the list;
  *     an unset principal is rejected (fail-closed — an anonymous caller
  *     never reads a controlled view);
  *   - the special member `allAuthenticatedUsers` (the public IAM member
  *     name for "any signed-in identity") matches any NON-empty principal;
  *   - an ACL granted to the empty list locks the view to everyone,
  *     including its owner — revocation is total, matching the fail-closed
  *     reading of a declared-but-empty policy elsewhere in this package.
  */
object ViewAcl {

  /** View property key: comma-separated principal list. */
  val PrincipalsProp = "graft.privacy.principals"

  /** Session conf key carrying the caller's authenticated identity. */
  val PrincipalConf = "spark.graft.principal"

  /** Public IAM special member: any non-empty authenticated principal. */
  val AllAuthenticated = "allAuthenticatedUsers"

  private def encode(ps: Seq[String]): String = {
    val cleaned = ps.map(_.trim).filter(_.nonEmpty)
    require(cleaned.forall(!_.contains(",")),
      s"principal names must not contain ',': ${cleaned.mkString("; ")}")
    cleaned.distinct.sorted.mkString(",")
  }

  private[privacy] def decode(v: String): Set[String] =
    v.split(",").map(_.trim).filter(_.nonEmpty).toSet

  /** Grant `principals` on an existing view (replaces nothing — adds to any
    * ACL already stamped on this view instance; stamping an ACL where none
    * existed turns access control ON for the view). */
  def grant(spark: SparkSession, viewName: String, principals: Seq[String]): Unit =
    PolicyCatalog.updatePropertiesOf(spark, viewName, props => {
      val existing = props.get(PrincipalsProp).map(decode).getOrElse(Set.empty)
      props + (PrincipalsProp -> encode((existing ++ principals).toSeq))
    })

  /** Remove `principals` from the view's ACL. On a view that HAS an ACL the
    * property REMAINS after the call (possibly empty = locked): revoking the
    * last grant must not silently re-open the view — dropping access control
    * entirely is [[clear]]. On a view with NO ACL the call is a no-op:
    * revoking from an uncontrolled view must not stamp an empty ACL and
    * lock out everyone including the owner. */
  def revoke(spark: SparkSession, viewName: String, principals: Seq[String]): Unit =
    PolicyCatalog.updatePropertiesOf(spark, viewName, props =>
      props.get(PrincipalsProp) match {
        case None => props // uncontrolled view: revoke is a no-op, never a lock
        case Some(aclStr) =>
          props + (PrincipalsProp ->
            encode((decode(aclStr) -- principals.map(_.trim)).toSeq))
      })

  /** Drop access control from the view (back to not-access-controlled). */
  def clear(spark: SparkSession, viewName: String): Unit =
    PolicyCatalog.updatePropertiesOf(spark, viewName, _ - PrincipalsProp)

  /** The session's declared principal, if any (empty string = unset). */
  def currentPrincipal(spark: SparkSession): Option[String] =
    Option(spark.sessionState.conf.getConfString(PrincipalConf, ""))
      .map(_.trim).filter(_.nonEmpty)
}

/** Analysis-time enforcement: every resolved [[View]] carrying an ACL
  * property is checked against the session principal; a miss rejects the
  * whole query before the policy rules even look at it. Subquery
  * expressions (scalar/IN/EXISTS) carry their own plans and are walked too
  * — a controlled view cannot be read through
  * `SELECT (SELECT x FROM acl_view LIMIT 1)`. CTE definitions are children
  * of [[org.apache.spark.sql.catalyst.plans.logical.WithCTE]], so the
  * standard tree walk covers `WITH x AS (SELECT ... FROM acl_view)`. */
class ViewAclRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = { check(plan); plan }

  private def check(plan: LogicalPlan): Unit = plan.foreach { node =>
    node match {
      case v: View =>
        v.desc.properties.get(ViewAcl.PrincipalsProp).foreach { aclStr =>
          val acl = ViewAcl.decode(aclStr)
          val bare = v.desc.identifier.table
          val name = v.desc.identifier.database.map(db => s"$db.$bare").getOrElse(bare)
          ViewAcl.currentPrincipal(spark) match {
            case None =>
              throw new PolicyViolationException(
                s"view '$name' is access-controlled and no principal is set " +
                  s"(session conf ${ViewAcl.PrincipalConf}) — access denied")
            case Some(p) if acl.contains(p) => ()
            case Some(_) if acl.contains(ViewAcl.AllAuthenticated) => ()
            case Some(p) =>
              throw new PolicyViolationException(
                s"principal '$p' is not authorized on view '$name'")
          }
        }
      case _ => ()
    }
    // subquery plans are not tree children — walk them explicitly so a
    // controlled view cannot be read through a scalar/IN/EXISTS subquery
    node.expressions.foreach(_.foreach {
      case s: SubqueryExpression => check(s.plan)
      case _ => ()
    })
  }
}
