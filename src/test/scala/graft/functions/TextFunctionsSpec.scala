package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {

  private def one(text: String, c: org.apache.spark.sql.Column): Any = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("t").select(c.as("r")).head().get(0)
  }

  test("tokens: empty and whitespace-only strings give empty arrays") {
    assert(one("", TextFunctions.tokenCount(col("t"))) === 0)
    assert(one("   ", TextFunctions.tokenCount(col("t"))) === 0)
    assert(one("a  b\tc", TextFunctions.tokenCount(col("t"))) === 3)
  }

  test("shingles: documents shorter than n yield empty, not an error") {
    val sh2 = TextFunctions.shingles(TextFunctions.tokens(col("t")), 2)
    assert(one("solo", sh2) === Seq())          // 1 token < n=2 (ADVICE case)
    assert(one("", sh2) === Seq())
    assert(one("a b c", sh2) === Seq("a b", "b c"))
    assert(one("a a a", sh2) === Seq("a a"))    // distinct
  }

  test("bpeish count splits word runs and punctuation") {
    assert(one("hello, world!", TextFunctions.bpeishCount(col("t"))) === 4)
  }

  test("langId picks the marker-richest language, 'und' when none") {
    val lid = TextFunctions.langId(TextFunctions.tokens(col("t")))
    assert(one("the cat and the dog is here", lid) === "en")
    assert(one("le chat et la mer les des", lid) === "fr")
    assert(one("zzz qqq", lid) === "und")
  }

  test("quality counts: stopwords and punctuation") {
    assert(one("the a of xyz", TextFunctions.stopwordCount(TextFunctions.tokens(col("t")))) === 3)
    assert(one("a, b. c!", TextFunctions.punctCount(col("t"))) === 3)
  }
}
