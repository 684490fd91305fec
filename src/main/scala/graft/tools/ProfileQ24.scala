package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.{DedupFunctions, TextFunctions}

/** Scratch profiler for the MinHash pipeline stages (not part of the
  * driver contract). */
object ProfileQ24 {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local("32", "profile-q24")
    import s.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sh = Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.tokens($"text").as("toks"))
      .select($"doc_id", TextFunctions.shingles($"toks", 3).as("sh"))
      .filter(size($"sh") > 0)
    time("shingles only")(sh.write.format("noop").mode("overwrite").save())
    val sig = sh.select($"doc_id", DedupFunctions.minhashSignature($"sh", 16).as("sig"))
    time("sig")(sig.write.format("noop").mode("overwrite").save())
    val bands = sig.select($"doc_id", explode(DedupFunctions.bandKeys($"sig", 8, 2)).as("bk"))
    time("bands")(bands.write.format("noop").mode("overwrite").save())
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    time("cand")(cand.write.format("noop").mode("overwrite").save())
    val shA = sh.select($"doc_id".as("doc_a"), $"sh".as("sh_a"))
    val shB = sh.select($"doc_id".as("doc_b"), $"sh".as("sh_b"))
    val jac = DedupFunctions.jaccard($"sh_a", $"sh_b")
    val out = cand.join(shA, "doc_a").join(shB, "doc_b")
      .filter(jac >= 0.5)
      .select($"doc_a", $"doc_b", round(jac, 6).as("jaccard"))
    time("full")(out.write.format("noop").mode("overwrite").save())
    println("cand count: " + cand.count())
    s.stop()
  }
}
