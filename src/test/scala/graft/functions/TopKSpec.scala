package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** [[graft.functions.expressions.TopK]] (`graft_topk`) — the bounded-state
  * grouped top-K aggregate. What must hold for the 100 TB claim:
  *
  *  1. window≡aggregate: the result equals the `row_number()` window
  *     formulation on the same data (the q113 oracle pins this
  *     cross-engine; here it's pinned per-row in-engine too).
  *  2. partition-layout invariance: any repartitioning of the input
  *     yields byte-identical results — the merge path (partial states
  *     crossing the exchange) must agree with the single-partition path.
  *  3. compaction correctness under k ≪ rows: the 4·K-bounded buffer
  *     compacts many times; nothing may be lost across compactions or
  *     serialize/deserialize cycles.
  *  4. tie discipline: equal scores break by id ASC, so results are a
  *     function of the input SET, not its order.
  */
class TopKSpec extends SparkSpec {

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int) = {
    df.groupBy("g")
      .agg(call_function("graft_topk", col("s"), col("i"), lit(k)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("rank"), col("col.score"), col("col.id"))
      .orderBy(col("g"), col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("window equivalence, partition invariance, and compaction at k << rows") {
    import spark.implicits._
    // 10k rows, 7 groups, deliberately few distinct scores → heavy ties
    val base = spark.range(10000)
      .select(($"id" % 7).as("g"), (($"id" * 37) % 101).as("s"), $"id".as("i"))
      .cache()
    try {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"s".desc, $"i".asc)
      val expect = base
        .withColumn("rank", row_number().over(w)).filter($"rank" <= 5)
        .select($"g", $"rank".cast("int"), $"s", $"i")
        .orderBy($"g", $"rank")
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSeq

      assert(topk(base, 5) == expect, "aggregate must equal the window formulation")
      assert(topk(base.repartition(1), 5) == expect, "single partition (no merge path)")
      assert(topk(base.repartition(32, $"i"), 5) == expect,
        "32-way scatter (merge-heavy path) must agree")
      assert(topk(base.orderBy($"i".desc), 5) == expect, "input order must not matter")
    } finally base.unpersist()
  }

  test("k larger than the group returns the whole group, sorted") {
    import spark.implicits._
    val tiny = Seq((1L, 10L, 1L), (1L, 30L, 2L), (1L, 20L, 3L))
      .toDF("g", "s", "i")
    assert(topk(tiny, 100) ==
      Seq((1L, 1, 30L, 2L), (1L, 2, 20L, 3L), (1L, 3, 10L, 1L)))
  }

  test("non-bigint score/id rejected at analysis time, not mid-execution") {
    import spark.implicits._
    val df = Seq((1L, 1.5, 1L)).toDF("g", "s", "i")
    val e = intercept[Exception] {
      df.groupBy("g")
        .agg(call_function("graft_topk", col("s"), col("i"), lit(2)))
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint") ||
      e.getMessage.contains("graft_topk"),
      s"expected an analysis-time type error naming the contract, got: ${e.getMessage}")
    assert(!e.isInstanceOf[ClassCastException],
      "type mismatch must fail analysis, not cast inside the aggregate")
  }

  test("plan: partial ObjectHashAggregate below the exchange — k-sized states shuffle") {
    import spark.implicits._
    val df = spark.range(1000)
      .select(($"id" % 3).as("g"), $"id".as("s"), $"id".as("i"))
      .groupBy("g").agg(call_function("graft_topk", col("s"), col("i"), lit(4)).as("top"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      "TypedImperativeAggregate must run as two-phase ObjectHashAggregate " +
        "(partial below the exchange), got:\n" + p)
    assert(p.contains("partial_graft_topk"), "map-side partial aggregation missing:\n" + p)
  }
}
