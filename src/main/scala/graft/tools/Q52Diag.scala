package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Dev diagnostic for q52's AllPairs cost drivers on a given SF dir:
  * corpus/vocabulary shape, prefix volume, posting-size distribution
  * (Σ|posting|² is the candidate-generation cost), and candidate/survivor
  * counts. Run when q52's wall time moves to attribute the change to data
  * vs plan (the corpus is driver-regenerated and CAN change shape between
  * rounds).
  *
  * {{{ sbt "runMain graft.tools.Q52Diag /root/testdata/sf0.1" }}}
  */
object Q52Diag {
  def main(args: Array[String]): Unit = {
    val Array(dir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val s = GraftSession.local(cores = cpus, appName = "q52-diag")
    import s.implicits._

    val sh = graft.Tables.documents(s, dir)
      .select($"doc_id",
        graft.functions.TextFunctions.shingles(
          graft.functions.TextFunctions.tokens($"text"), 3).as("sh"))
      .filter(size($"sh") > 0)
    val tok = sh.select($"doc_id", size($"sh").as("sz"), explode($"sh").as("tk"))
    val docs = sh.count()
    val szStats = tok.select($"doc_id", $"sz").distinct()
      .agg(avg($"sz"), max($"sz"), sum($"sz")).head()
    val vocab = tok.select($"tk").distinct().count()
    val dfq = tok.groupBy($"tk").agg(count(lit(1)).as("df"))
    val dfStats = dfq.agg(avg($"df"), max($"df")).head()

    // prefix volume + posting distribution exactly as q52 builds them:
    // per-doc sets ordered df-ascending (ties by token), first p elements
    // feed the inverted index (window-ranked here — diag only, the real
    // query assigns dense gids distributed)
    val p = ($"sz" - floor(($"sz" * 7 + 9) / 10) + 1).cast("int")
    val gids = tok.join(dfq, "tk").groupBy($"doc_id", $"sz")
      .agg(sort_array(collect_list(struct($"df", $"tk"))).as("ord"))
    val pre = gids.select($"doc_id", explode(slice($"ord", lit(1), p)).as("g"))
    val preRows = pre.count()
    val post = pre.groupBy($"g.tk").agg(count(lit(1)).as("n")).filter($"n" > 1)
    val postStats = post.agg(count(lit(1)), max($"n"), sum($"n" * ($"n" - 1) / 2)).head()

    def lv(r: org.apache.spark.sql.Row, i: Int): Long = r.getAs[Number](i).longValue()
    println(s"[q52diag] dir=$dir docs=$docs vocab=$vocab " +
      s"avg_sz=${szStats.getDouble(0)} max_sz=${lv(szStats, 1)} tok_rows=${lv(szStats, 2)} " +
      s"avg_df=${dfStats.getDouble(0)} max_df=${lv(dfStats, 1)} " +
      s"prefix_rows=$preRows postings_gt1=${lv(postStats, 0)} " +
      s"max_posting=${lv(postStats, 1)} cand_pairs_sum=${lv(postStats, 2)}")
    s.stop()
  }
}
