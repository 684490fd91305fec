package graft.vector

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.VectorQueries

/** q135's maintenance contract: the incrementally-maintained postings
  * counts equal a from-scratch re-index of the post-delta corpus.
  */
class IvfDeltaSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("incremental counts equal a full re-index of the post-delta corpus") {
    val s = spark
    import s.implicits._
    val model = IvfFrozen.model
    val e = graft.Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val arrivals = e.filter($"vec_id" % 9 === 2)
      .select(($"vec_id" + 100000L).as("vec_id"),
        concat(slice($"v", lit(3), size($"v") - 2), slice($"v", lit(1), lit(2))).as("v"))
    val post = e.filter($"vec_id" % 13 =!= 5).unionByName(arrivals)
    val full = post.select(Ivf.cellOf($"v", model).cast("long").as("cell"))
      .groupBy($"cell").agg(count(lit(1)).as("n_full"))

    val incr = VectorQueries.q135IvfDeltaInsert(spark, dir)
      .select($"cell", $"n_after")
    val mismatch = incr.join(full, Seq("cell"), "full_outer")
      .na.fill(0L, Seq("n_after", "n_full"))
      .filter($"n_after" =!= $"n_full").count()
    assert(mismatch == 0L)

    // the delta really moves cells: additions and removals both nonzero
    val sums = VectorQueries.q135IvfDeltaInsert(spark, dir)
      .agg(sum($"n_added"), sum($"n_removed")).head()
    assert(sums.getLong(0) > 0 && sums.getLong(1) > 0)
  }
}
