package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q141's escaping contract on markup-hostile text the synthetic corpus
  * doesn't contain: entities, quotes, and newlines must survive the XML
  * write/read byte-for-byte (the md5 gate computed both ways).
  */
class XmlRoundtripSpec extends SparkSpec {

  test("markup-hostile text survives the XML round trip byte-for-byte") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("xml-rt")
    val texts = Seq(
      "plain words",
      "a & b < c > d",
      "quotes \" and ' inside",
      "multi\nline\ntext",
      "unicode é世界 and ]]> sequence",
      "<doc>fake markup</doc>")
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "spec", t.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    val want = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, org.apache.commons.codec.digest.DigestUtils.md5Hex(
        t.getBytes("UTF-8")))
    }.toMap
    val got = CoreQueries.q141XmlRoundtrip(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(got == want)
  }
}
