package graft.privacy

import org.scalatest.BeforeAndAfterEach

import graft.SparkSpec

/** Both branches of the privacy rule (O23): suppression of under-threshold
  * groups, and rejection of raw-row access — pinned to the reference's
  * clean-room policy (`/root/reference/sql/sp_demo_cleanroom.sql:51-57`). */
class AggregationThresholdSpec extends SparkSpec with BeforeAndAfterEach {

  // the policy is stamped on the temp-view instance itself; dropping the
  // view is the cleanup (there is no side registry)
  override def afterEach(): Unit = {
    spark.catalog.dropTempView("trip_pp")
    spark.catalog.dropTempView("trips")
  }

  private def setupTrips(): Unit = {
    val s = spark
    import s.implicits._
    // city A: 2 distinct customers; city B: 1; city C: 3
    Seq(
      (1L, 101L, "A", 10.0), (2L, 102L, "A", 20.0), (3L, 101L, "A", 5.0),
      (4L, 201L, "B", 7.0),  (5L, 201L, "B", 9.0),
      (6L, 301L, "C", 1.0),  (7L, 302L, "C", 2.0), (8L, 303L, "C", 3.0))
      .toDF("trip_id", "customer_id", "city", "fare")
      .createOrReplaceTempView("trips")
    spark.sql("CREATE OR REPLACE TEMP VIEW trip_pp AS SELECT * FROM trips")
    PolicyCatalog.setPolicy(spark, "trip_pp", AggregationThresholdPolicy("customer_id", 2))
  }

  test("groups below the distinct-unit threshold are suppressed") {
    setupTrips()
    val out = spark.sql(
      "SELECT city, count(*) AS n, sum(fare) AS total FROM trip_pp GROUP BY city")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    // city B (1 distinct customer) suppressed; A and C kept
    assert(out === Seq(("A", 3L, 35.0), ("C", 3L, 6.0)))
  }

  test("grouping by the privacy unit itself suppresses every group") {
    setupTrips()
    assert(spark.sql("SELECT customer_id, count(*) FROM trip_pp GROUP BY customer_id")
      .count() === 0)
  }

  test("raw-row access through the policy view is rejected") {
    setupTrips()
    val e = intercept[Exception](spark.sql("SELECT * FROM trip_pp").collect())
    assert(e.getMessage.contains("must aggregate"))
  }

  test("filters and joins below the aggregate are allowed; threshold still applies") {
    setupTrips()
    val out = spark.sql(
      """SELECT city, count(*) AS n FROM trip_pp WHERE fare > 1.0 GROUP BY city""")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    // C loses trip 6 (fare 1.0) -> still 2 distinct customers -> kept
    assert(out === Seq(("A", 3L), ("C", 2L)))
  }

  test("global aggregate (no GROUP BY) passes when enough distinct units") {
    setupTrips()
    val n = spark.sql("SELECT count(*) AS n FROM trip_pp").collect()(0).getLong(0)
    assert(n === 8L)
  }

  test("raw access through an expression subquery is also rejected") {
    setupTrips()
    val e = intercept[Exception](spark.sql(
      "SELECT (SELECT city FROM trip_pp LIMIT 1)").collect())
    assert(e.getMessage.contains("must aggregate"))
  }

  test("aggregating subqueries over the policy view are allowed and filtered") {
    setupTrips()
    val n = spark.sql(
      "SELECT (SELECT count(*) FROM trip_pp) AS n").collect()(0).getLong(0)
    assert(n === 8L)
  }

  test("unrelated views are untouched") {
    setupTrips()
    assert(spark.sql("SELECT * FROM trips").count() === 8L)
  }

  test("composing on top of an aggregated DataFrame does not double-enforce") {
    setupTrips()
    val agg = spark.sql("SELECT city, count(*) AS n FROM trip_pp GROUP BY city")
    val out = agg.filter("n >= 0").orderBy("city").collect().map(_.getString(0))
    assert(out.toSeq === Seq("A", "C"))
  }

  // --- adversarial cases: the query author is the attacker -----------------

  test("reserved-prefix alias spoofing cannot disable the threshold") {
    setupTrips()
    // pre-fix, an author-written `__privacy_cd_0` alias made the rule believe
    // the aggregate was already protected and city B (1 distinct customer)
    // leaked. Now the rewrite mark is a TreeNodeTag — unforgeable from SQL —
    // and reserved-prefix aliases over a policy view are rejected outright,
    // so the attack yields an error, never an under-threshold row.
    val e = intercept[Exception](spark.sql(
      "SELECT city, count(*) AS __privacy_cd_0 FROM trip_pp GROUP BY city").collect())
    assert(e.getMessage.contains("reserved privacy prefix"))
  }

  test("a subquery alias sharing the view name is NOT enforced against") {
    setupTrips()
    // `trip_pp` here is a derived-relation alias, not the policy view —
    // enforcement keys on resolved view identity, so raw access is fine
    val out = spark.sql("SELECT * FROM (SELECT 1 AS x) AS trip_pp").collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(1))
  }

  test("a re-created view without the policy reads raw (no stale-policy leak)") {
    setupTrips()
    assert(intercept[Exception](spark.sql("SELECT * FROM trip_pp").collect())
      .getMessage.contains("must aggregate"))
    // replace the view WITHOUT re-declaring the policy: the policy dies with
    // the old view instance (CREATE OR REPLACE ... OPTIONS semantics)
    graft.sql.CleanRoom.createView(spark, "trip_pp", "SELECT * FROM trips")
    assert(spark.sql("SELECT * FROM trip_pp").count() === 8L)
  }

  test("a CTE over the policy view cannot smuggle raw rows out") {
    setupTrips()
    val e = intercept[Exception](spark.sql(
      "WITH x AS (SELECT * FROM trip_pp) SELECT * FROM x").collect())
    assert(e.getMessage.contains("must aggregate"))
  }

  test("aggregating through a CTE still applies the threshold") {
    setupTrips()
    val out = spark.sql(
      """WITH x AS (SELECT * FROM trip_pp)
        |SELECT city, count(*) AS n FROM x GROUP BY city""".stripMargin)
      .collect().map(_.getString(0)).sorted
    assert(out.toSeq === Seq("A", "C")) // city B suppressed through the CTE
  }

  test("set operations over the policy view are rejected outright") {
    setupTrips()
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM trip_pp UNION ALL SELECT * FROM trip_pp").collect())
    assert(e.getMessage.contains("set operations"))
  }

  test("the UNION threshold-inflation attack is rejected") {
    setupTrips()
    // the attack: union the policy view with attacker-supplied rows that
    // add fake distinct customers to an under-threshold group, aggregate,
    // then subtract the known fake contribution from the published numbers
    // to recover the suppressed group. The rule must refuse to let a set
    // operation merge policy rows with other row sources at all.
    val s = spark
    import s.implicits._
    Seq((90L, 901L, "B", 1.0), (91L, 902L, "B", 1.0))
      .toDF("trip_id", "customer_id", "city", "fare")
      .createOrReplaceTempView("attacker_rows")
    val e = intercept[Exception](spark.sql(
      """SELECT city, count(DISTINCT customer_id) AS cd, count(*) AS n FROM
        |  (SELECT customer_id, city FROM trip_pp
        |   UNION ALL SELECT customer_id, city FROM attacker_rows) u
        |GROUP BY city""".stripMargin).collect())
    assert(e.getMessage.contains("set operations"))
  }

  test("a scalar subquery over an outer CTE of the policy view is still protected") {
    setupTrips()
    // pre-fix bypass: the subquery plan was protected with an EMPTY cte
    // environment, so the reference to x resolved to no policy and the raw
    // under-threshold row leaked
    val e = intercept[Exception](spark.sql(
      """WITH x AS (SELECT * FROM trip_pp)
        |SELECT (SELECT customer_id FROM x WHERE city = 'B' LIMIT 1)""".stripMargin)
      .collect())
    assert(e.getMessage.contains("must aggregate"))
  }

  test("aliasing another column to the unit name cannot inflate the distinct count") {
    setupTrips()
    // pre-fix bypass: the rule resolved the unit column BY NAME in the
    // aggregate's child, so `trip_id AS customer_id` (4 distinct trips in
    // city B vs 1 real customer) passed the threshold and published the
    // suppressed group. The unit attribute is now traced by exprId.
    val e = intercept[Exception](spark.sql(
      """SELECT city, count(*) AS n FROM
        |  (SELECT city, trip_id AS customer_id FROM trip_pp) t
        |GROUP BY city""".stripMargin).collect())
    assert(e.getMessage.contains("not available below the aggregate"))
  }

  test("a joined-in same-named column cannot stand in for the unit column") {
    setupTrips()
    val s = spark
    import s.implicits._
    // attacker joins a table whose customer_id column is high-cardinality
    Seq((1L, 9901L), (2L, 9902L), (3L, 9903L), (4L, 9904L),
        (5L, 9905L), (6L, 9906L), (7L, 9907L), (8L, 9908L))
      .toDF("trip_id", "customer_id").createOrReplaceTempView("attacker_dim")
    val e = intercept[Exception](spark.sql(
      """SELECT t.city, count(*) AS n FROM
        |  (SELECT p.city, a.customer_id
        |   FROM trip_pp p JOIN attacker_dim a ON p.trip_id = a.trip_id) t
        |GROUP BY t.city""".stripMargin).collect())
    assert(e.getMessage.contains("not available below the aggregate"))
  }

  test("selecting the real unit column through a projection still enforces") {
    setupTrips()
    val out = spark.sql(
      """SELECT city, count(*) AS n FROM
        |  (SELECT city, customer_id FROM trip_pp) t
        |GROUP BY city""".stripMargin)
      .collect().map(_.getString(0)).sorted
    assert(out.toSeq === Seq("A", "C"))
  }

  test("value-revealing aggregate functions over the policy view are rejected") {
    setupTrips()
    // the threshold gate suppresses small GROUPS, but min/max/collect_list/
    // any_value emit raw values from groups that PASS it — the reference
    // policy restricts the permitted aggregate list for exactly this reason
    for (agg <- Seq("min(customer_id)", "max(customer_id)", "first(customer_id)",
        "any_value(customer_id)", "collect_list(customer_id)", "collect_set(customer_id)",
        "min(fare)", "percentile(fare, 0.5)", "mode(fare)")) {
      val e = intercept[Exception](spark.sql(
        s"SELECT city, $agg FROM trip_pp GROUP BY city").collect())
      assert(e.getMessage.contains("not allowed over policy view"), s"for $agg")
    }
  }

  test("a unit-targeted CASE inside a permitted aggregate is rejected") {
    setupTrips()
    // sum() is whitelisted, but sum(CASE WHEN customer_id=101 THEN fare END)
    // publishes one individual's exact total from an above-threshold group
    val e = intercept[Exception](spark.sql(
      """SELECT city, sum(CASE WHEN customer_id = 101 THEN fare END) AS f
        |FROM trip_pp GROUP BY city""".stripMargin).collect())
    assert(e.getMessage.contains("only as count"))
  }

  test("a unit-targeted aggregate FILTER clause is rejected") {
    setupTrips()
    val e = intercept[Exception](spark.sql(
      """SELECT city, count(*) FILTER (WHERE customer_id = 101) AS n
        |FROM trip_pp GROUP BY city""".stripMargin).collect())
    assert(e.getMessage.contains("FILTER"))
  }

  test("renaming the unit column cannot launder it into a permitted sum()") {
    setupTrips()
    // both the real unit (so the exprId presence check passes) AND an alias
    // of it are selected; sum over the ALIAS would publish raw unit values.
    // Taint tracing marks the alias as unit-derived and rejects the sum.
    val e = intercept[Exception](spark.sql(
      """SELECT city, sum(cid2) AS s FROM
        |  (SELECT city, customer_id, customer_id AS cid2 FROM trip_pp) t
        |GROUP BY city""".stripMargin).collect())
    assert(e.getMessage.contains("derived"))
  }

  test("count(DISTINCT unit) itself stays allowed") {
    setupTrips()
    val out = spark.sql(
      "SELECT city, count(DISTINCT customer_id) AS cd FROM trip_pp GROUP BY city")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(out.toSeq === Seq(("A", 2L), ("C", 3L)))
  }

  test("a window aggregate is not an aggregate: windowed projection is rejected") {
    setupTrips()
    // count(*) OVER (PARTITION BY city) produces per-ROW output — no
    // Aggregate node, no threshold gate — and must not pass silently
    val e = intercept[Exception](spark.sql(
      "SELECT city, count(*) OVER (PARTITION BY city) AS n FROM trip_pp").collect())
    assert(e.getMessage.contains("window functions over policy view"))
  }

  test("a window function below the aggregate cannot smuggle unit values") {
    setupTrips()
    // first_value(customer_id) OVER (...) mints a fresh attribute carrying
    // raw unit values; a later whitelisted sum() would publish them
    val e = intercept[Exception](spark.sql(
      """SELECT city, sum(fv) AS s FROM
        |  (SELECT city, first_value(customer_id) OVER (PARTITION BY city ORDER BY trip_id) AS fv
        |   FROM trip_pp) t
        |GROUP BY city""".stripMargin).collect())
    assert(e.getMessage.contains("window functions over policy view"))
  }

  test("windowing over the aggregated (suppressed) result is allowed") {
    setupTrips()
    val out = spark.sql(
      """SELECT city, n, rank() OVER (ORDER BY n DESC, city) AS r FROM
        |  (SELECT city, count(*) AS n FROM trip_pp GROUP BY city) g""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(2))).sortBy(_._1)
    assert(out.toSeq === Seq(("A", 1), ("C", 2)))
  }

  test("join-laundering the unit column through an attacker relation is rejected") {
    setupTrips()
    // the attack forward taint alone cannot see: equi-join the unit column
    // to a relation whose OTHER column encodes the join key (pow(2, id)),
    // then sum that column — an exact bitmask of the group's customer ids
    // through a whitelisted aggregate. A join condition touching the unit
    // taints the entire other side.
    val s = spark
    import s.implicits._
    (100L to 310L).map(id => (id, math.pow(2.0, (id % 50).toDouble)))
      .toDF("id", "enc").createOrReplaceTempView("attacker_enc")
    val e = intercept[Exception](spark.sql(
      """SELECT city, sum(l.enc) AS s FROM trip_pp t
        |JOIN attacker_enc l ON t.customer_id = l.id
        |GROUP BY city""".stripMargin).collect())
    assert(e.getMessage.contains("derived"))
  }

  test("joins on non-unit keys still aggregate joined columns freely") {
    setupTrips()
    val s = spark
    import s.implicits._
    Seq(("A", 10.0), ("B", 20.0), ("C", 30.0)).toDF("city", "tax")
      .createOrReplaceTempView("city_dim")
    val out = spark.sql(
      """SELECT t.city, count(*) AS n, sum(d.tax) AS tax_total
        |FROM trip_pp t JOIN city_dim d ON t.city = d.city
        |GROUP BY t.city""".stripMargin)
      .collect().map(_.getString(0)).sorted
    assert(out.toSeq === Seq("A", "C")) // threshold still suppresses B
  }

  test("a join ON the unit column still allows count(*)") {
    setupTrips()
    val s = spark
    import s.implicits._
    Seq((101L, "gold"), (201L, "basic"), (301L, "gold"))
      .toDF("cid", "tier").createOrReplaceTempView("tiers")
    val out = spark.sql(
      """SELECT t.city, count(*) AS n FROM trip_pp t
        |JOIN tiers x ON t.customer_id = x.cid GROUP BY t.city""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // A: only customer 101 joins -> 1 distinct unit -> suppressed;
    // C: only 301 joins -> suppressed; B: only 201 -> suppressed
    assert(out.isEmpty)
  }

  test("HAVING cannot smuggle a value-revealing aggregate past the whitelist") {
    setupTrips()
    // Spark plans HAVING by widening the Aggregate with the extra
    // aggregate expression and projecting it away — the whitelist must see
    // it there, or min(unit) leaks through a clause that never appears in
    // the SELECT list
    val e = intercept[Exception](spark.sql(
      """SELECT city, count(*) AS n FROM trip_pp
        |GROUP BY city HAVING min(customer_id) > 100""".stripMargin).collect())
    assert(e.getMessage.contains("not allowed over policy view"))
  }

  test("ORDER BY cannot smuggle a value-revealing aggregate either") {
    setupTrips()
    val e = intercept[Exception](spark.sql(
      """SELECT city, count(*) AS n FROM trip_pp
        |GROUP BY city ORDER BY max(customer_id)""".stripMargin).collect())
    assert(e.getMessage.contains("not allowed over policy view"))
  }

  test("removePolicy detaches the policy from the live view instance") {
    setupTrips()
    assert(intercept[Exception](spark.sql("SELECT * FROM trip_pp").collect())
      .getMessage.contains("must aggregate"))
    PolicyCatalog.removePolicy(spark, "trip_pp")
    assert(spark.sql("SELECT * FROM trip_pp").count() === 8L)
  }

  test("re-created view WITH a re-declared policy is enforced again") {
    setupTrips()
    graft.sql.CleanRoom.createPolicyView(spark, "trip_pp",
      "SELECT * FROM trips", "customer_id", 2)
    val e = intercept[Exception](spark.sql("SELECT * FROM trip_pp").collect())
    assert(e.getMessage.contains("must aggregate"))
    val out = spark.sql(
      "SELECT city, count(*) AS n FROM trip_pp GROUP BY city")
      .collect().map(_.getString(0)).sorted
    assert(out.toSeq === Seq("A", "C"))
  }
}
