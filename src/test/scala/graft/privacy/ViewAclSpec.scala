package graft.privacy

import org.scalatest.BeforeAndAfterEach

import graft.SparkSpec

/** The WHO axis of the clean room (O23's companion): every branch of
  * [[ViewAclRule]]'s enforcement — authorized pass, unauthorized deny,
  * unset-principal deny, `allAuthenticatedUsers`, empty-list lock,
  * grant/revoke/clear lifecycle, CREATE OR REPLACE dropping the ACL, and
  * reads through scalar/IN subqueries and CTEs. Mirrors the reference's
  * principal-scoped sharing model (`/root/reference/terraform/main.tf:437-440`
  * IAM grants; `/root/reference/sql/sp_demo_cleanroom.sql:20-27`). */
class ViewAclSpec extends SparkSpec with BeforeAndAfterEach {

  private def setPrincipal(p: String): Unit =
    spark.conf.set(ViewAcl.PrincipalConf, p)
  private def unsetPrincipal(): Unit =
    spark.conf.set(ViewAcl.PrincipalConf, "")

  override def beforeEach(): Unit = {
    val s = spark
    import s.implicits._
    Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "x", 5.0))
      .toDF("id", "k", "v").createOrReplaceTempView("acl_base")
    spark.sql("CREATE OR REPLACE TEMP VIEW acl_v AS SELECT * FROM acl_base")
  }

  override def afterEach(): Unit = {
    unsetPrincipal()
    spark.catalog.dropTempView("acl_v")
    spark.catalog.dropTempView("acl_base")
  }

  private def denied(sql: String): String = {
    val e = intercept[Exception](spark.sql(sql).collect())
    e.getMessage
  }

  test("a view without an ACL is readable by anyone, principal set or not") {
    unsetPrincipal()
    assert(spark.sql("SELECT count(*) FROM acl_v").collect()(0).getLong(0) === 3L)
    setPrincipal("mallory")
    assert(spark.sql("SELECT count(*) FROM acl_v").collect()(0).getLong(0) === 3L)
  }

  test("granted principal reads; non-granted principal is denied") {
    ViewAcl.grant(spark, "acl_v", Seq("alice"))
    setPrincipal("alice")
    assert(spark.sql("SELECT sum(v) FROM acl_v").collect()(0).getDouble(0) === 35.0)
    setPrincipal("mallory")
    assert(denied("SELECT * FROM acl_v").contains("not authorized"))
  }

  test("unset principal is denied on a controlled view (fail-closed)") {
    ViewAcl.grant(spark, "acl_v", Seq("alice"))
    unsetPrincipal()
    assert(denied("SELECT * FROM acl_v").contains("no principal is set"))
  }

  test("allAuthenticatedUsers admits any non-empty principal, never an unset one") {
    ViewAcl.grant(spark, "acl_v", Seq(ViewAcl.AllAuthenticated))
    setPrincipal("anyone-at-all")
    assert(spark.sql("SELECT count(*) FROM acl_v").collect()(0).getLong(0) === 3L)
    unsetPrincipal()
    assert(denied("SELECT * FROM acl_v").contains("no principal is set"))
  }

  test("grant adds to an existing ACL; both principals read") {
    ViewAcl.grant(spark, "acl_v", Seq("alice"))
    ViewAcl.grant(spark, "acl_v", Seq("bob"))
    setPrincipal("alice")
    assert(spark.sql("SELECT count(*) FROM acl_v").count() === 1L)
    setPrincipal("bob")
    assert(spark.sql("SELECT count(*) FROM acl_v").count() === 1L)
  }

  test("revoking the last grant LOCKS the view (empty ACL ≠ no ACL)") {
    ViewAcl.grant(spark, "acl_v", Seq("alice"))
    ViewAcl.revoke(spark, "acl_v", Seq("alice"))
    setPrincipal("alice")
    assert(denied("SELECT * FROM acl_v").contains("not authorized"))
    setPrincipal("anyone-else")
    assert(denied("SELECT * FROM acl_v").contains("not authorized"))
  }

  test("revoke on a view with NO ACL is a no-op, never a lock") {
    ViewAcl.revoke(spark, "acl_v", Seq("alice"))
    unsetPrincipal()
    // still uncontrolled: an anonymous read succeeds
    assert(spark.sql("SELECT count(*) FROM acl_v").collect()(0).getLong(0) === 3L)
  }

  test("clear drops access control entirely; the view is public again") {
    ViewAcl.grant(spark, "acl_v", Seq("alice"))
    ViewAcl.clear(spark, "acl_v")
    unsetPrincipal()
    assert(spark.sql("SELECT count(*) FROM acl_v").collect()(0).getLong(0) === 3L)
  }

  test("CREATE OR REPLACE mints a fresh view instance without the ACL") {
    ViewAcl.grant(spark, "acl_v", Seq("alice"))
    spark.sql("CREATE OR REPLACE TEMP VIEW acl_v AS SELECT * FROM acl_base")
    setPrincipal("mallory")
    assert(spark.sql("SELECT count(*) FROM acl_v").collect()(0).getLong(0) === 3L)
  }

  test("a controlled view cannot be read through a scalar subquery") {
    ViewAcl.grant(spark, "acl_v", Seq("alice"))
    setPrincipal("mallory")
    assert(denied("SELECT (SELECT max(v) FROM acl_v)").contains("not authorized"))
  }

  test("a controlled view cannot be read through an IN subquery") {
    ViewAcl.grant(spark, "acl_v", Seq("alice"))
    setPrincipal("mallory")
    assert(denied(
      "SELECT * FROM acl_base WHERE id IN (SELECT id FROM acl_v)")
      .contains("not authorized"))
  }

  test("a controlled view cannot be read through a CTE") {
    ViewAcl.grant(spark, "acl_v", Seq("alice"))
    setPrincipal("mallory")
    assert(denied(
      "WITH c AS (SELECT * FROM acl_v) SELECT count(*) FROM c")
      .contains("not authorized"))
    setPrincipal("alice")
    assert(spark.sql("WITH c AS (SELECT * FROM acl_v) SELECT count(*) FROM c")
      .collect()(0).getLong(0) === 3L)
  }

  test("ACL composes with the aggregation-threshold policy: WHO first, then HOW") {
    ViewAcl.grant(spark, "acl_v", Seq("alice"))
    PolicyCatalog.setPolicy(spark, "acl_v", AggregationThresholdPolicy("id", 2))
    // denied principal: ACL fires BEFORE the threshold rule — the error is
    // the authorization one, revealing nothing about the aggregation policy
    setPrincipal("mallory")
    val msg = denied("SELECT k, count(*) FROM acl_v GROUP BY k")
    assert(msg.contains("not authorized") && !msg.contains("aggregat"))
    // authorized principal: the threshold policy still applies
    setPrincipal("alice")
    val rows = spark.sql("SELECT k, count(*) AS n FROM acl_v GROUP BY k")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("x", 2L))) // k='y' backed by 1 distinct id → suppressed
    assert(denied("SELECT * FROM acl_v").contains("not authorized") ||
      denied("SELECT * FROM acl_v").contains("must aggregate"))
  }

  test("TRUST BOUNDARY pinned: a SQL SET on the principal conf IS honored") {
    // the deployment seam, stated as a test: nothing in-engine stops the
    // query author impersonating via SET — a real cluster must inject and
    // pin the conf outside SQL (see ViewAcl scaladoc)
    ViewAcl.grant(spark, "acl_v", Seq("alice"))
    setPrincipal("mallory")
    spark.sql(s"SET ${ViewAcl.PrincipalConf}=alice")
    assert(spark.sql("SELECT count(*) FROM acl_v").collect()(0).getLong(0) === 3L)
  }

  test("DURABLE view: ACL + threshold policy both survive a session restart") {
    // the reference binds policy and principals to the durable object, not
    // the session (`/root/reference/sql/sp_demo_cleanroom.sql:51-57`); here
    // both the ACL (grant → TBLPROPERTIES via alterTable) and the threshold
    // policy ride the catalog view's own metadata, so a NEW session over the
    // same catalog enforces both with zero session-side state carried over
    try {
      spark.sql("CREATE TABLE acl_dur_base (trip_id BIGINT, customer_id BIGINT, " +
        "city STRING) USING parquet")
      spark.sql("INSERT INTO acl_dur_base VALUES (1,10,'A'),(2,11,'A'),(3,12,'B')")
      graft.sql.CleanRoom.createDurablePolicyView(spark, "acl_dur_view",
        "SELECT * FROM acl_dur_base", "customer_id", 2)
      ViewAcl.grant(spark, "acl_dur_view", Seq("subscriber"))

      val s2 = spark.newSession()
      def denied2(sql: String): String =
        intercept[Exception](s2.sql(sql).collect()).getMessage
      val agg = "SELECT city, count(*) AS n FROM acl_dur_view GROUP BY city"
      // WHO is checked before HOW, from the fresh session too: a rejected
      // principal learns nothing about the aggregation policy
      s2.conf.set(ViewAcl.PrincipalConf, "mallory")
      val mallory = denied2(agg)
      assert(mallory.contains("not authorized") && !mallory.contains("aggregat"))
      s2.conf.set(ViewAcl.PrincipalConf, "")
      assert(denied2(agg).contains("no principal is set"))
      // the authorized principal's read is still THRESHOLDED (policy intact)
      s2.conf.set(ViewAcl.PrincipalConf, "subscriber")
      val cities = s2.sql(agg).collect().map(_.getString(0))
      assert(cities.toSeq === Seq("A")) // B: 1 distinct customer → suppressed
      assert(denied2("SELECT * FROM acl_dur_view").contains("must aggregate"))
    } finally {
      spark.sql("DROP VIEW IF EXISTS acl_dur_view")
      spark.sql("DROP TABLE IF EXISTS acl_dur_base")
    }
  }

  test("a subquery alias sharing the view's name is not enforced against") {
    ViewAcl.grant(spark, "acl_v", Seq("alice"))
    setPrincipal("mallory")
    // the FROM-alias `acl_v` shadows nothing — it is a plain subquery, not
    // the catalog view, and carries no properties
    assert(spark.sql(
      "SELECT count(*) FROM (SELECT 1 AS id) acl_v").collect()(0).getLong(0) === 1L)
  }
}
