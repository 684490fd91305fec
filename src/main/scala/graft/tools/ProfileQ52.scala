package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.{DedupFunctions, TextFunctions}

/** Scratch profiler for the q52 prefix-filter pipeline stages (not part of
  * the driver contract). */
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
    time("tok")(noop(tok))
    val dfreq = tok.groupBy($"tk").agg(count(lit(1)).as("df"))
    time("dfreq")(noop(dfreq))
    val ranked = tok.join(dfreq, "tk")
      .groupBy($"doc_id", $"sz")
      .agg(sort_array(collect_list(struct($"df", $"tk"))).as("ord"))
    time("ranked")(noop(ranked))
    val p = ($"sz" - floor(($"sz" * 7 + 9) / 10) + 1).cast("int")
    val pre = ranked.select($"doc_id",
      explode(transform(slice($"ord", lit(1), p), e => e.getField("tk"))).as("tk"))
    time("pre")(noop(pre))
    val cand = pre.groupBy($"tk")
      .agg(sort_array(collect_list($"doc_id")).as("ids"))
      .filter(size($"ids") > 1)
      .select(explode(DedupFunctions.pairExpand($"ids")).as("pr"))
      .select($"pr.a".as("doc_a"), $"pr.b".as("doc_b"))
      .distinct()
    time("cand")(noop(cand))
    println("cand count: " + cand.count())
    val shA = sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a"))
    val shB = sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b"))
    val inter = size(array_intersect($"sh_a", $"sh_b"))
    val uni = size(array_union($"sh_a", $"sh_b"))
    val out = cand.join(shA, "doc_a").join(shB, "doc_b")
      .filter(inter * 10 >= uni * 7)
      .select($"doc_a", $"doc_b", round(inter.cast("double") / uni, 6).as("jaccard"))
    time("verify+full")(noop(out))
    s.stop()
  }
}
