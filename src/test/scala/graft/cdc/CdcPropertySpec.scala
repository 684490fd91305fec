package graft.cdc

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.streaming.Fixtures

/** Property test (ScalaCheck generators, fixed seed): for ANY row content —
  * unicode, quotes, newlines, empty and null fields — and any op, the wire
  * round trip `row → envelope JSON → parse → unwrap` reproduces the row
  * with the correct `__deleted` flag. All 120 cases run as ONE Spark job. */
class CdcPropertySpec extends SparkSpec {

  private val trickyString: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr,
    Gen.const(""),
    Gen.const("""with "quotes" and \backslash"""),
    Gen.const("line\nbreak\ttab"),
    Gen.const("émöjî 😀 中文 русский"),
    Gen.const("null"),
    Gen.asciiPrintableStr)

  import CdcPropertySpec.P

  private val genRow: Gen[P] = for {
    id <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
    f <- Gen.option(trickyString); l <- Gen.option(trickyString)
    e <- Gen.option(trickyString)
    z <- Gen.option(Gen.chooseNum(-99999L, 99999L))
    c <- Gen.option(trickyString); co <- Gen.option(trickyString)
    op <- Gen.oneOf("c", "u", "d")
  } yield P(id, f, l, e, z, c, co, op)

  test("envelope round trip is lossless for arbitrary content (120 cases)") {
    val s = spark
    import s.implicits._
    val cases = Gen.listOfN(120, genRow)
      .apply(Gen.Parameters.default, Seed(42L))
      .getOrElse(sys.error("generator failed"))

    val in = cases.toDF("id", "first", "last", "email", "zip", "city", "country", "op")
    val row = struct($"id", $"first".as("first_name"), $"last".as("last_name"),
      $"email", $"zip".as("zipcode"), $"city", $"country")
    val wire = in.select(to_json(struct(
      when($"op" === "d", row).as("before"),
      when($"op" =!= "d", row).as("after"),
      struct(lit("debezium_test").as("db"), lit("people").as("table")).as("source"),
      $"op", lit(0L).as("ts_ms"))).as("value"))

    val out = Cdc.unwrapRewrite(Cdc.parseEnvelope(wire, "value", Fixtures.rowV1))

    val got = out.select($"id", $"first_name", $"last_name", $"email",
        $"zipcode", $"city", $"country", $"__deleted")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val want = cases.sortBy(_.id).map(p => Seq(
      p.id, p.first.orNull, p.last.orNull, p.email.orNull,
      p.zip.map(Long.box).orNull, p.city.orNull, p.country.orNull,
      if (p.op == "d") "true" else "false"))
    assert(got.length === want.length)
    got.zip(want).foreach { case (g, w) => assert(g === w) }
  }
}

object CdcPropertySpec {
  // top-level so Spark can derive an Encoder (inner classes capture scope)
  final case class P(id: Long, first: Option[String], last: Option[String],
                     email: Option[String], zip: Option[Long],
                     city: Option[String], country: Option[String], op: String)
}
