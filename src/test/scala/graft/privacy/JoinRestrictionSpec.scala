package graft.privacy

import org.scalatest.BeforeAndAfterEach

import graft.SparkSpec

/** The join-restriction clean-room primitive (BigQuery analysis rules'
  * `join_restriction_policy`): accept surface for every mode, plus the
  * adversarial reject surface — the q22 suite's discipline — covering
  * disallowed keys, expression-wrapped keys, renamed-key laundering,
  * cross-join + filter smuggling, correlated-subquery smuggling, union
  * re-keying, JOIN_BLOCKED, and JOIN_ALL partial keys. */
class JoinRestrictionSpec extends SparkSpec with BeforeAndAfterEach {

  override def afterEach(): Unit = {
    Seq("people_jr", "people_base", "visits").foreach { v =>
      try spark.catalog.dropTempView(v) catch { case _: Exception => () }
    }
  }

  private def setup(mode: JoinConditionMode,
                    allowed: Seq[String] = Seq("person_id")): Unit = {
    val s = spark
    import s.implicits._
    Seq((1L, "ann", "90210", 100.0), (2L, "bob", "10001", 250.0),
      (3L, "cat", "90210", 75.0))
      .toDF("person_id", "name", "zip", "balance")
      .createOrReplaceTempView("people_base")
    Seq((1L, "2024-01-01"), (1L, "2024-01-02"), (2L, "2024-01-01"),
      (9L, "2024-01-03"))
      .toDF("person_id", "day")
      .createOrReplaceTempView("visits")
    spark.sql("CREATE OR REPLACE TEMP VIEW people_jr AS SELECT * FROM people_base")
    JoinRestrictionCatalog.setPolicy(spark, "people_jr",
      JoinRestrictionPolicy(mode, if (mode == JoinConditionMode.Blocked) Nil else allowed))
  }

  private def rejects(sql: String, fragment: String): Unit = {
    val e = intercept[PolicyViolationException](spark.sql(sql).collect())
    assert(e.getMessage.contains(fragment), s"message was: ${e.getMessage}")
  }

  // ------------------------------------------------------------- accepts

  test("JOIN_ANY: equi-join on the allowed column passes") {
    setup(JoinConditionMode.JoinAny)
    val n = spark.sql(
      """SELECT p.name, count(*) AS c FROM people_jr p
        |JOIN visits v ON p.person_id = v.person_id GROUP BY p.name""".stripMargin)
      .collect().length
    assert(n === 2)
  }

  test("JOIN_ANY: the allowed join spelled as a WHERE over a comma join passes") {
    setup(JoinConditionMode.JoinAny)
    val n = spark.sql(
      """SELECT count(*) AS c FROM people_jr p, visits v
        |WHERE p.person_id = v.person_id""".stripMargin)
      .collect().head.getLong(0)
    assert(n === 3L)
  }

  test("JOIN_NOT_REQUIRED: raw un-joined reads pass") {
    setup(JoinConditionMode.NotRequired)
    assert(spark.sql("SELECT * FROM people_jr").collect().length === 3)
  }

  test("JOIN_ALL: join keying on every allowed column passes") {
    setup(JoinConditionMode.JoinAll, Seq("person_id", "zip"))
    val s = spark
    import s.implicits._
    Seq((1L, "90210"), (2L, "90210")).toDF("pid", "z")
      .createOrReplaceTempView("aux_all")
    assert(spark.sql(
      """SELECT count(*) AS c FROM people_jr p JOIN aux_all a
        |ON p.person_id = a.pid AND p.zip = a.z""".stripMargin)
      .collect().head.getLong(0) === 1L)
    spark.catalog.dropTempView("aux_all")
  }

  test("a plain same-named subquery alias is not the policy view") {
    setup(JoinConditionMode.Blocked)
    // reading people_base (no policy) joined freely is fine — the policy
    // binds to the view INSTANCE, not the name pattern
    assert(spark.sql(
      """SELECT count(*) FROM people_base p JOIN visits v
        |ON p.person_id = v.person_id""".stripMargin).collect().head.getLong(0) === 3L)
  }

  // ------------------------------------------------------------- rejects

  test("JOIN_BLOCKED rejects any join") {
    setup(JoinConditionMode.Blocked)
    rejects(
      """SELECT * FROM people_jr p JOIN visits v
        |ON p.person_id = v.person_id""".stripMargin, "JOIN_BLOCKED")
  }

  test("a disallowed join key is rejected") {
    setup(JoinConditionMode.JoinAny)
    rejects(
      """SELECT * FROM people_jr p JOIN visits v
        |ON p.zip = CAST(v.person_id AS STRING)""".stripMargin, "disallowed")
  }

  test("an expression-wrapped allowed key is rejected") {
    setup(JoinConditionMode.JoinAny)
    rejects(
      """SELECT * FROM people_jr p JOIN visits v
        |ON p.person_id + 0 = v.person_id""".stripMargin, "restricts join keys")
  }

  test("renamed-key laundering is rejected (alias is not the declared column)") {
    setup(JoinConditionMode.JoinAny)
    rejects(
      """SELECT * FROM (SELECT person_id AS pid, name FROM people_jr) p
        |JOIN visits v ON p.pid = v.person_id""".stripMargin, "restricts join keys")
  }

  test("a disallowed residual predicate on an otherwise-allowed join is rejected") {
    setup(JoinConditionMode.JoinAny)
    rejects(
      """SELECT * FROM people_jr p JOIN visits v
        |ON p.person_id = v.person_id AND p.zip = v.day""".stripMargin,
      "restricts join keys")
  }

  test("cross-join + WHERE smuggling is rejected") {
    setup(JoinConditionMode.NotRequired)
    rejects(
      """SELECT * FROM people_jr p CROSS JOIN visits v
        |WHERE p.zip = v.day""".stripMargin, "restricts join keys")
  }

  test("non-equi linkage through a filter is rejected") {
    setup(JoinConditionMode.NotRequired)
    rejects(
      """SELECT * FROM people_jr p JOIN visits v
        |ON p.person_id = v.person_id
        |WHERE p.balance < v.person_id * 100""".stripMargin, "restricts join keys")
  }

  test("correlated-subquery smuggling on a disallowed column is rejected") {
    setup(JoinConditionMode.NotRequired)
    rejects(
      """SELECT * FROM visits v WHERE EXISTS
        |(SELECT 1 FROM people_jr p WHERE p.zip = CAST(v.person_id AS STRING))""".stripMargin,
      "restricts join keys")
  }

  test("correlated EXISTS on the allowed column passes and satisfies JOIN_ANY") {
    setup(JoinConditionMode.JoinAny)
    val n = spark.sql(
      """SELECT count(*) FROM visits v WHERE EXISTS
        |(SELECT 1 FROM people_jr p WHERE p.person_id = v.person_id)""".stripMargin)
      .collect().head.getLong(0)
    assert(n === 3L)
  }

  test("JOIN_ANY without any join is rejected (a join is required)") {
    setup(JoinConditionMode.JoinAny)
    rejects("SELECT * FROM people_jr", "must join the view")
  }

  test("JOIN_ALL with only some allowed columns keyed is rejected") {
    setup(JoinConditionMode.JoinAll, Seq("person_id", "zip"))
    rejects(
      """SELECT * FROM people_jr p JOIN visits v
        |ON p.person_id = v.person_id""".stripMargin, "JOIN_ALL")
  }

  test("union re-keying is rejected") {
    setup(JoinConditionMode.NotRequired)
    rejects(
      """SELECT person_id FROM people_jr
        |UNION ALL SELECT person_id FROM visits""".stripMargin, "set operations")
  }

  test("the policy survives reading the view through a CTE") {
    setup(JoinConditionMode.JoinAny)
    rejects(
      """WITH x AS (SELECT * FROM people_jr)
        |SELECT * FROM x JOIN visits v ON x.zip = v.day""".stripMargin,
      "restricts join keys")
    // and the allowed join through the CTE still passes
    assert(spark.sql(
      """WITH x AS (SELECT * FROM people_jr)
        |SELECT count(*) FROM x JOIN visits v ON x.person_id = v.person_id""".stripMargin)
      .collect().head.getLong(0) === 3L)
  }

  test("CREATE OR REPLACE without restating the policy drops it") {
    setup(JoinConditionMode.Blocked)
    spark.sql("CREATE OR REPLACE TEMP VIEW people_jr AS SELECT * FROM people_base")
    assert(spark.sql(
      """SELECT count(*) FROM people_jr p JOIN visits v
        |ON p.person_id = v.person_id""".stripMargin).collect().head.getLong(0) === 3L)
  }

  test("a half-declared policy fails closed") {
    setup(JoinConditionMode.JoinAny)
    PolicyCatalog.updatePropertiesOf(spark, "people_jr",
      _ - JoinRestrictionCatalog.ColsProp) // mode without columns, non-BLOCKED
    rejects("SELECT * FROM people_jr", "incomplete join restriction")
  }
}
