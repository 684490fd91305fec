package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.{DedupFunctions, TextFunctions}

/** Scratch profiler for the q52 prefix-filter pipeline stages — mirrors the
  * SHIPPED shape (gid dictionary encoding, distributed zipWithIndex dense
  * ids, int-array verification with arithmetic union), so its stage
  * timings decompose the query actually being optimized. Not part of the
  * driver contract. */
object ProfileQ52 {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local("32", "profile-q52")
    import s.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val sh = Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.shingles(TextFunctions.tokens($"text"), 3).as("sh"))
      .filter(size($"sh") > 0)
    time("sh")(noop(sh))
    val tok = sh.select($"doc_id", size($"sh").as("sz"), explode($"sh").as("tk"))
    val dfreq = tok.groupBy($"tk").agg(count(lit(1)).as("df"))
    time("dfreq")(noop(dfreq))
    val dict = {
      val sorted = dfreq.repartitionByRange(s.sessionState.conf.numShufflePartitions,
          $"df", $"tk")
        .sortWithinPartitions($"df", $"tk")
        .select($"tk")
      sorted.rdd.map(_.getString(0)).zipWithIndex()
        .map { case (tk, i) => (tk, i + 1) }.toDF("tk", "gid")
    }
    time("dict")(noop(dict))
    val gids = tok.join(dict, "tk")
      .groupBy($"doc_id", $"sz")
      .agg(sort_array(collect_list($"gid")).as("ord"))
      .localCheckpoint(true)
    time("gids(checkpointed)")(noop(gids))
    val p = ($"sz" - floor(($"sz" * 7 + 9) / 10) + 1).cast("int")
    val pre = gids.select($"doc_id", explode(slice($"ord", lit(1), p)).as("gid"))
    val cand = pre.groupBy($"gid")
      .agg(sort_array(collect_list($"doc_id")).as("ids"))
      .filter(size($"ids") > 1)
      .select(explode(DedupFunctions.pairExpand($"ids")).as("pr"))
      .select($"pr.a".as("doc_a"), $"pr.b".as("doc_b"))
      .distinct()
    time("cand")(noop(cand))
    println("cand count: " + cand.count())
    val gA = gids.select($"doc_id".as("doc_a"), $"ord".as("ord_a"), $"sz".as("sz_a"))
    val gB = gids.select($"doc_id".as("doc_b"), $"ord".as("ord_b"), $"sz".as("sz_b"))
    val inter = call_function("graft_intersect_size", $"ord_a", $"ord_b")
    val uni = $"sz_a" + $"sz_b" - inter
    val out = cand.join(gA, "doc_a").join(gB, "doc_b")
      .filter(inter * 10 >= uni * 7)
      .select($"doc_a", $"doc_b", round(inter.cast("double") / uni, 6).as("jaccard"))
    time("verify+full")(noop(out))
    s.stop()
  }
}
