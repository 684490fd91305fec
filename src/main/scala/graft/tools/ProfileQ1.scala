package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftSession, Tables}

/** Scratch profiler: decompose q1_agg's cost (scan vs decimal sums vs
  * double sums vs sort) — not part of the driver contract. */
object ProfileQ1 {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.local("32", "profile-q1")
    import s.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[A](name: String)(f: => A): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime(); f
        println(f"[profile] $name rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = Tables.lineitem(s, dir)
    time("scan-count")(noop(li.select($"l_quantity")))
    time("filter-only")(noop(li.filter($"l_shipdate" <= lit("2000-12-31 00:00:00").cast("timestamp"))
      .select($"l_quantity")))
    time("double-sums")(noop(li
      .filter($"l_shipdate" <= lit("2000-12-31 00:00:00").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity"), sum($"l_extendedprice"),
        sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), count(lit(1)))))
    time("decimal-sums")(noop(li
      .filter($"l_shipdate" <= lit("2000-12-31 00:00:00").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity".cast(DecimalType(18, 2))),
        sum($"l_extendedprice".cast(DecimalType(18, 2))),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast(DecimalType(18, 4))),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).cast(DecimalType(18, 6))),
        count(lit(1)))))
    time("full-q1")(noop(graft.queries.CoreQueries.q1Agg(s, dir)))
    s.stop()
  }
}
