package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The masking-view security contract that the q167 aggregate gate can't
  * see: raw values never appear through the view, tokens are joinable
  * across views, and masks behave at short-value edges.
  */
class MaskingViewSpec extends SparkSpec {

  test("masked columns never expose raw values; tokens stay joinable; edges behave") {
    val s = spark
    import s.implicits._
    Seq((1L, "Customer#000000001", 2500.0, "AB"),
      (2L, "Customer#000000002", 999.0, "AB"),
      (3L, "xy", 0.0, "CD")) // name shorter than the suffix width
      .toDF("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .createOrReplaceTempView("mask_base")
    CleanRoom.createMaskingView(spark, "mask_v", "mask_base",
      Map("c_name" -> CleanRoom.SuffixMask(3),
        "c_custkey" -> CleanRoom.HashMask,
        "c_acctbal" -> CleanRoom.BucketMask(1000)))
    val rows = spark.table("mask_v")
      .orderBy($"c_mktsegment", $"c_name").collect()

    // raw names/keys never appear; suffix survives; short value passes whole
    val names = rows.map(_.getAs[String]("c_name"))
    assert(names.forall(!_.contains("Customer")))
    assert(names.count(_.endsWith("001")) == 1 && names.count(_.endsWith("002")) == 1)
    assert(names.contains("xy"))
    val keys = rows.map(_.getAs[String]("c_custkey"))
    assert(keys.forall(k => k.length == 12 && k.matches("[0-9a-f]+")))
    assert(keys.distinct.length == 3)
    // buckets generalize (floor(x/w)*w comes back integral)
    assert(rows.map(_.getAs[Long]("c_acctbal")).sorted.toSeq == Seq(0L, 0L, 2000L))

    // tokens are DETERMINISTIC and joinable: a second masking view over an
    // overlapping base produces the same token for the same key
    Seq((1L, "other", 1.0, "ZZ"))
      .toDF("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .createOrReplaceTempView("mask_base2")
    CleanRoom.createMaskingView(spark, "mask_v2", "mask_base2",
      Map("c_custkey" -> CleanRoom.HashMask))
    val joined = spark.table("mask_v").join(spark.table("mask_v2"), "c_custkey")
    assert(joined.count() == 1L)
  }

  test("KeyedHashMask defeats candidate enumeration; same key stays joinable") {
    val s = spark
    import s.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c"))
      .toDF("c_custkey", "tag").createOrReplaceTempView("kmask_base")
    CleanRoom.createMaskingView(spark, "kmask_v", "kmask_base",
      Map("c_custkey" -> CleanRoom.KeyedHashMask("s3cret")))
    val toks = spark.table("kmask_v").collect().map(_.getAs[String]("c_custkey"))
    assert(toks.forall(t => t.length == 12 && t.matches("[0-9a-f]+")))
    assert(toks.distinct.length == 3)

    // the enumeration attack that breaks unsalted HashMask on a sequential
    // domain: hash every candidate key and look for token collisions. It
    // recovers EVERY row under HashMask and ZERO rows under KeyedHashMask.
    val unsaltedTok = (k: Long) =>
      spark.sql(s"SELECT substring(md5(cast($k AS STRING)), 1, 12)").head.getString(0)
    CleanRoom.createMaskingView(spark, "umask_v", "kmask_base",
      Map("c_custkey" -> CleanRoom.HashMask))
    val unsalted = spark.table("umask_v").collect().map(_.getAs[String]("c_custkey")).toSet
    val candidates = (1L to 100L).map(unsaltedTok)
    assert(candidates.count(unsalted.contains) == 3)            // fully reversed
    assert(candidates.count(toks.toSet.contains) == 0)           // keyed: opaque

    // two views sharing the key join; a different key does not
    CleanRoom.createMaskingView(spark, "kmask_v2", "kmask_base",
      Map("c_custkey" -> CleanRoom.KeyedHashMask("s3cret")))
    assert(spark.table("kmask_v").join(spark.table("kmask_v2"), "c_custkey").count() == 3L)
    CleanRoom.createMaskingView(spark, "kmask_v3", "kmask_base",
      Map("c_custkey" -> CleanRoom.KeyedHashMask("other")))
    assert(spark.table("kmask_v").join(spark.table("kmask_v3"), "c_custkey").count() == 0L)

    intercept[IllegalArgumentException] {
      CleanRoom.KeyedHashMask("bad'key")
    }
  }
}
