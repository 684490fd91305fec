package graft.schema

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

/** The compatibility trichotomy on the reference's own golden shapes
  * (`/root/reference/README.md:299-450`): G5 (add nullable `age`) must be
  * accepted, G6 (drop the required `zipcode`) must be rejected FORWARD,
  * plus the direction-specific nullability rules and registry state on
  * rejection. Pure control-plane — no SparkSession. */
class SchemaCompatSpec extends AnyFunSuite {

  import CompatibilityMode._

  private val people = StructType.fromDDL(
    "id BIGINT NOT NULL, first_name STRING, last_name STRING, email STRING, " +
      "zipcode BIGINT NOT NULL, city STRING, country STRING")
  private val peopleWithAge = StructType.fromDDL(
    "id BIGINT NOT NULL, first_name STRING, last_name STRING, email STRING, " +
      "zipcode BIGINT NOT NULL, city STRING, country STRING, age BIGINT")
  private val peopleDropped = StructType.fromDDL(
    "id BIGINT NOT NULL, first_name STRING, last_name STRING, email STRING, " +
      "city STRING, country STRING")

  private def bad(cur: StructType, prop: StructType, m: CompatibilityMode) =
    SchemaRegistry.incompatibilities(cur, prop, m)

  test("G5: adding a nullable column is compatible in every mode") {
    for (m <- Seq(NoCheck, Backward, Forward, Full))
      assert(bad(people, peopleWithAge, m).isEmpty, m.name)
  }

  test("G6: dropping a required column is FORWARD-incompatible (and FULL), but BACKWARD-fine") {
    assert(bad(peopleWithAge, peopleDropped, Forward).exists(_.contains("zipcode")))
    assert(bad(peopleWithAge, peopleDropped, Full).exists(_.contains("zipcode")))
    // a new-schema reader simply ignores old data's zipcode — backward OK
    assert(bad(peopleWithAge, peopleDropped, Backward).isEmpty)
    assert(bad(peopleWithAge, peopleDropped, NoCheck).isEmpty)
  }

  test("dropping a NULLABLE column is fine in every direction") {
    val noCity = StructType.fromDDL(
      "id BIGINT NOT NULL, first_name STRING, last_name STRING, email STRING, " +
        "zipcode BIGINT NOT NULL, country STRING")
    for (m <- Seq(Backward, Forward, Full))
      assert(bad(people, noCity, m).isEmpty, m.name)
  }

  test("adding a REQUIRED column is BACKWARD-incompatible, FORWARD-fine") {
    val withReq = StructType.fromDDL(
      "id BIGINT NOT NULL, first_name STRING, last_name STRING, email STRING, " +
        "zipcode BIGINT NOT NULL, city STRING, country STRING, ssn STRING NOT NULL")
    assert(bad(people, withReq, Backward).exists(_.contains("ssn")))
    assert(bad(people, withReq, Full).exists(_.contains("ssn")))
    assert(bad(people, withReq, Forward).isEmpty)
  }

  test("an in-place type change is rejected under every checked mode") {
    val zipStr = StructType.fromDDL(
      "id BIGINT NOT NULL, first_name STRING, last_name STRING, email STRING, " +
        "zipcode STRING NOT NULL, city STRING, country STRING")
    for (m <- Seq(Backward, Forward, Full))
      assert(bad(people, zipStr, m).exists(_.contains("changes type")), m.name)
    assert(bad(people, zipStr, NoCheck).isEmpty)
  }

  test("nullability changes are direction-specific") {
    val cityReq = StructType.fromDDL(
      "id BIGINT NOT NULL, first_name STRING, last_name STRING, email STRING, " +
        "zipcode BIGINT NOT NULL, city STRING NOT NULL, country STRING")
    // tightening nullable -> required: old data may hold nulls => BACKWARD
    assert(bad(people, cityReq, Backward).exists(_.contains("tightens")))
    assert(bad(people, cityReq, Forward).isEmpty)
    // loosening required -> nullable: new data may carry nulls => FORWARD
    assert(bad(cityReq, people, Forward).exists(_.contains("loosens")))
    assert(bad(cityReq, people, Backward).isEmpty)
  }

  test("registerRevision: first revision always passes; rejection leaves the registry untouched") {
    val reg = new SchemaRegistry
    val r1 = reg.registerRevision("people", people, Full)
    val r2 = reg.registerRevision("people", peopleWithAge, Full)
    assert(r1.revisionId !== r2.revisionId)
    val e = intercept[SchemaCompatibilityException](
      reg.registerRevision("people", peopleDropped, Full))
    assert(e.violations.exists(_.contains("zipcode")))
    assert(reg.latest("people").revisionId === r2.revisionId)
    assert(reg.history("people").map(_.revisionId) === Seq(r1, r2).map(_.revisionId))
  }

  test("registerRevision stays idempotent on an identical schema") {
    val reg = new SchemaRegistry
    val r1 = reg.registerRevision("people", people, Full)
    val again = reg.registerRevision("people", people, Full)
    assert(again.revisionId === r1.revisionId)
    assert(reg.history("people").size === 1)
  }
}
