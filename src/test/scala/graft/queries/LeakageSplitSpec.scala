package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q129's leakage guard + q130's vocabulary-level BPE statistics, checked on
  * the real sf0.001 corpus (the same inputs the oracle gate replays).
  */
class LeakageSplitSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q129: no near-dup cluster straddles a split boundary") {
    val s = spark
    import s.implicits._
    val split = TextQueries.q129LeakageSplit(spark, dir).cache()

    // the guard property itself: every cluster maps to exactly one split
    val straddlers = split.groupBy($"cluster_id")
      .agg(countDistinct($"split").as("nsplits"))
      .filter($"nsplits" > 1).count()
    assert(straddlers == 0L)

    // and in particular every mined near-dup PAIR trains and evals together
    val pairs = TextQueries.q24DedupMinhash(spark, dir)
      .select($"doc_a", $"doc_b")
    val crossPair = pairs
      .join(split.select($"doc_id".as("doc_a"), $"split".as("sa")), "doc_a")
      .join(split.select($"doc_id".as("doc_b"), $"split".as("sb")), "doc_b")
      .filter($"sa" =!= $"sb").count()
    assert(crossPair == 0L)

    // fences are live: all three splits non-empty, train the large one
    val bydst = split.groupBy($"split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bydst.keySet == Set("train", "val", "test"))
    assert(bydst("train") > bydst("val") && bydst("train") > bydst("test"))
    split.unpersist()
  }

  test("q129: deterministic across runs (hash split, not RNG)") {
    val a = TextQueries.q129LeakageSplit(spark, dir).collect().toSeq
    val b = TextQueries.q129LeakageSplit(spark, dir).collect().toSeq
    assert(a == b)
  }

  test("q130: pair counts equal a direct per-document count (vocab fold is lossless)") {
    val s = spark
    import s.implicits._
    // reference: count pairs straight off every token OCCURRENCE (no vocab
    // fold) — the two-level plan must give identical totals
    val direct = graft.Tables.documents(spark, dir)
      .select(explode(graft.functions.TextFunctions.tokens($"text")).as("tok"))
      .filter(length($"tok") >= 2)
      .select(explode(transform(sequence(lit(1), length($"tok") - 1),
        i => $"tok".substr(i, lit(2)))).as("pair"))
      .groupBy($"pair").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"pair").limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

    val viaVocab = TextQueries.q130BpeMerges(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaVocab == direct)
    assert(viaVocab.size == 20)
    // top candidate count is positive and ordering is (cnt desc, pair asc)
    assert(viaVocab.head._2 >= viaVocab.last._2)
  }
}
