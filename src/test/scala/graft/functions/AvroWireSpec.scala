package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential coverage for the native Avro wire codec
  * ([[graft.functions.expressions.AvroEncode]]/[[graft.functions.expressions.AvroDecode]]):
  * decode(encode(x)) must be the identity on every supported field type,
  * and the derived wire schema must round-trip through its JSON form. */
class AvroWireSpec extends SparkSpec {

  import spark.implicits._

  private def wireSchemaOf(df: org.apache.spark.sql.DataFrame, col: org.apache.spark.sql.Column): String =
    org.apache.spark.sql.avro.SchemaConverters
      .toAvroType(df.select(col.as("r")).schema("r").dataType, nullable = false)
      .toString

  test("decode(encode(row)) is the identity on long/string/double fields") {
    val df = Seq(
      (1L, "alpha", 1.5, 1000L),
      (2L, "", -2.25, -1L),
      (3L, "βητα μυλτibyte", 0.0, 0L),
      (Long.MaxValue, "z" * 300, Double.MinPositiveValue, Long.MinValue)
    ).toDF("id", "s", "d", "t")
    val rec = struct($"id", $"s", $"d", $"t")
    val schema = wireSchemaOf(df, rec)
    val back = df.select(
      $"id".as("orig_id"), $"s".as("orig_s"), $"d".as("orig_d"), $"t".as("orig_t"),
      call_function("graft_avro_decode",
        call_function("graft_avro_encode", rec, lit(schema)), lit(schema)).as("r"))
    val bad = back.filter(
      $"r.id" =!= $"orig_id" || $"r.s" =!= $"orig_s" ||
        $"r.d" =!= $"orig_d" || $"r.t" =!= $"orig_t")
    assert(bad.count() == 0L, bad.collect().mkString("\n"))
  }

  test("null field values survive the union encoding") {
    val df = Seq[(java.lang.Long, String)]((1L, null), (null, "x"), (2L, "y"))
      .toDF("a", "b")
    val rec = struct($"a", $"b")
    val schema = wireSchemaOf(df, rec)
    val back = df.select($"a".as("oa"), $"b".as("ob"),
      call_function("graft_avro_decode",
        call_function("graft_avro_encode", rec, lit(schema)), lit(schema)).as("r"))
    val bad = back.filter(!($"r.a" <=> $"oa") || !($"r.b" <=> $"ob"))
    assert(bad.count() == 0L, bad.collect().mkString("\n"))
  }

  test("optimizer nullability narrowing cannot desync writer and reader schemas") {
    // the q125 regression shape: an IsNotNull filter lets the optimizer
    // narrow the attribute to non-nullable at execution, so a writer schema
    // DERIVED from child.dataType would lose the union branch the reader
    // still expects — the explicit shared literal makes both ends agree
    val df = Seq[(java.lang.Long, String)]((1L, "purchase"), (2L, "view"), (null, "purchase"))
      .toDF("a", "b")
    val rec = struct($"a", $"b")
    val schema = wireSchemaOf(df, rec)
    val back = df.filter($"b" === "purchase" && $"a".isNotNull)
      .select($"a".as("oa"), $"b".as("ob"),
        call_function("graft_avro_decode",
          call_function("graft_avro_encode", rec, lit(schema)), lit(schema)).as("r"))
    val bad = back.filter(!($"r.a" <=> $"oa") || !($"r.b" <=> $"ob"))
    assert(bad.count() == 0L, bad.collect().mkString("\n"))
  }

  test("FAILFAST covers trailing bytes: a parseable prefix must not pass") {
    // corruption that leaves a valid record followed by garbage (truncated
    // concatenation, double-write) decodes cleanly from Avro's point of
    // view; the decoder must check the buffer is fully consumed
    val df = Seq((7L, "stable")).toDF("id", "s")
    val rec = struct($"id", $"s")
    val schema = wireSchemaOf(df, rec)
    val corrupted = df.select(concat(
      call_function("graft_avro_encode", rec, lit(schema)),
      lit(Array[Byte](1, 2, 3))).as("bytes"))
    val e = intercept[Exception] {
      corrupted.select(call_function("graft_avro_decode", $"bytes", lit(schema))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("trailing bytes")), messages(e).mkString(" | "))
  }

  test("wire bytes are deterministic: same row encodes to the same message") {
    val df = Seq((7L, "stable")).toDF("id", "s")
    val rec = struct($"id", $"s")
    val schema = wireSchemaOf(df, rec)
    val two = df.select(
      md5(call_function("graft_avro_encode", rec, lit(schema))).as("m1"),
      md5(call_function("graft_avro_encode", rec, lit(schema))).as("m2"))
    val r = two.head()
    assert(r.getString(0) == r.getString(1))
  }
}
