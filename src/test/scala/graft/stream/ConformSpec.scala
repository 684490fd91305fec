package graft.stream

import org.apache.spark.sql.types._

import graft.SparkSpec

/** The three sink-drift rules (O7/O11) as units + a conformance law. */
class ConformSpec extends SparkSpec {

  private val topic = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("zip", LongType)))

  test("rule 1: message fields beyond the topic schema are dropped") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 10L, "extra")).toDF("id", "name", "zip", "phone")
    val out = Conform.validateAgainstTopic(df, topic)
    assert(out.columns.toSeq === Seq("id", "name", "zip"))
  }

  test("rule 2: sink-only columns are NULL-filled") {
    val s = spark
    import s.implicits._
    val sink = StructType(topic.fields :+ StructField("age", LongType))
    val df = Seq((1L, "a", 10L)).toDF("id", "name", "zip")
    val out = Conform.conformToSink(df, topic, sink)
    assert(out.columns.toSeq === Seq("id", "name", "zip", "age"))
    assert(out.filter(out("age").isNotNull).count() === 0)
  }

  test("rule 3: topic field with no sink column throws SchemaMismatchException") {
    val s = spark
    import s.implicits._
    val sink = StructType(topic.fields.filterNot(_.name == "zip"))
    val df = Seq((1L, "a", 10L)).toDF("id", "name", "zip")
    val e = intercept[Conform.SchemaMismatchException](
      Conform.conformToSink(df, topic, sink))
    assert(e.missingInSink === Seq("zip"))
  }

  test("law: conformed output schema equals the sink schema, for EVERY field subset") {
    val s = spark
    import s.implicits._
    val allCols = Seq("id", "name", "zip")
    val sink = StructType(topic.fields :+ StructField("age", LongType))
    // exhaustive over all 2^3 subsets of topic fields present in the input
    for (mask <- 0 until 8) {
      val present = allCols.zipWithIndex.collect { case (c, i) if (mask & (1 << i)) != 0 => c }
      val base = Seq((1L, "a", 10L)).toDF(allCols: _*)
      val df =
        if (present.isEmpty) base.select(org.apache.spark.sql.functions.lit(0).as("dummy"))
        else base.select(present.map(org.apache.spark.sql.functions.col): _*)
      val out = Conform.conformToSink(Conform.validateAgainstTopic(df, topic), topic, sink)
      assert(out.schema.fieldNames.toSeq === sink.fieldNames.toSeq, s"subset $present")
    }
  }
}
