package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q143's replica-comparison contract and q144's census against a
  * brute-force reference on constructed graphs.
  */
class ChecksumTrianglesSpec extends SparkSpec {

  private def writeTables(dir: String, docText: Long => String): Unit = {
    val s = spark
    import s.implicits._
    Seq((1L, 10L, 100L, 1, 2.0, 10.0, 0.05, 0.01, "N", "O",
      java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, 5L, "O", 10.0,
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    (0L until 40L).map(i => (i, docText(i), "en", "spec", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
  }

  test("identical replicas fingerprint equal; a one-row edit localizes to its table") {
    val dirA = tmpDir("ck-a"); val dirB = tmpDir("ck-b"); val dirC = tmpDir("ck-c")
    writeTables(dirA, i => s"text-$i")
    writeTables(dirB, i => s"text-$i")
    writeTables(dirC, i => if (i == 7L) "CORRUPTED" else s"text-$i")
    def fp(d: String) = CoreQueries.q143TableChecksum(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getString(3)))
      .toMap
    val a = fp(dirA); val b = fp(dirB); val c = fp(dirC)
    assert(a == b) // byte-identical replicas, any partitioning → equal
    assert(a != c)
    // the divergence localizes to documents buckets only
    val diff = a.keySet ++ c.keySet
    val changed = diff.filter(k => a.get(k) != c.get(k))
    assert(changed.nonEmpty && changed.forall(_._1 == "documents"))
  }

  test("triangle census matches a brute-force reference on a constructed graph") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("tri")
    // baskets: {1,2,3,4} is a K4 (4 triangles), {4,5,6} one more triangle
    // sharing node 4, {1,2} duplicates an existing edge (distinctness)
    val baskets = Seq(
      1L -> Seq(1L, 2L, 3L, 4L), 2L -> Seq(4L, 5L, 6L), 3L -> Seq(1L, 2L))
    baskets.flatMap { case (o, ps) => ps.map(p => (o, p)) }
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_suppkey", lit(1L)).withColumn("l_linenumber", lit(1))
      .withColumn("l_quantity", lit(1.0)).withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0)).withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N")).withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .write.parquet(s"$dir/lineitem.parquet")

    // brute-force reference over the distinct undirected edges
    val edges = baskets.flatMap { case (_, ps) =>
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.distinct
    val eset = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val refTri = (for {
      a <- nodes; b <- nodes if a < b; c <- nodes if b < c
      if eset((a, b)) && eset((b, c)) && eset((a, c))
    } yield 1).size

    val row = CoreQueries.q144Triangles(spark, dir).collect().head
    assert(row.getLong(0) == nodes.size)
    assert(row.getLong(1) == edges.size)
    assert(row.getLong(3) == refTri)
    assert(refTri == 5)
  }

  test("degree orientation suppresses hub wedges: a star yields ZERO wedge work") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("tri-star")
    // a 40-leaf star via 40 two-item baskets {hub, leaf}: naive wedge
    // enumeration at the hub would generate C(40,2) = 780 pairs; under
    // (deg, id) orientation every leaf (deg 1) points INTO the hub, the
    // hub has out-degree 0, and the wedge join emits nothing at all
    val hub = 1000L
    (1L to 40L).flatMap(leaf => Seq((leaf, hub), (leaf, leaf)))
      .toDF("l_orderkey", "l_partkey")
      .withColumn("l_suppkey", lit(1L)).withColumn("l_linenumber", lit(1))
      .withColumn("l_quantity", lit(1.0)).withColumn("l_extendedprice", lit(1.0))
      .withColumn("l_discount", lit(0.0)).withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("N")).withColumn("l_linestatus", lit("O"))
      .withColumn("l_shipdate",
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .write.parquet(s"$dir/lineitem.parquet")
    val row = CoreQueries.q144Triangles(spark, dir).collect().head
    assert(row.getLong(0) == 41L && row.getLong(1) == 40L)
    assert(row.getLong(2) == 0L, "oriented wedge count must be zero on a star")
    assert(row.getLong(3) == 0L)
  }
}
