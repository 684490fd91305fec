package graft.queries

import graft.SparkSpec

/** q99 fixpoint contracts: the converged labels are a true fixpoint (one
  * more propagation round changes nothing), and on this corpus — where
  * cluster diameter ≤ 2 — the fixpoint agrees with q40's fixed-3-round
  * labels (the two operators' documented relationship). */
class ConnectedComponentsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("fixpoint agrees with q40's fixed rounds where diameter <= 3, sizes partition the corpus") {
    val s = spark
    import s.implicits._
    val cc = TextQueries.q99ConnectedComponents(s, dir).collect()
    val q40 = TextQueries.q40DedupClusters(s, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.nonEmpty)
    cc.foreach { r =>
      assert(r.getLong(1) === q40(r.getLong(0)),
        s"doc ${r.getLong(0)}: fixpoint component ${r.getLong(1)} != q40 ${q40(r.getLong(0))}")
    }
    // component sizes are consistent: every member of a component reports
    // the same size, and the sizes sum to the vertex count
    val byComp = cc.groupBy(_.getLong(1))
    byComp.foreach { case (comp, rows) =>
      assert(rows.map(_.getLong(2)).distinct.length === 1)
      assert(rows.head.getLong(2) === rows.length.toLong,
        s"component $comp reports size ${rows.head.getLong(2)} but has ${rows.length} members")
    }
    assert(byComp.values.map(_.length).sum === cc.length)
    // every component is labeled by its minimum member (the canonical rule)
    byComp.foreach { case (comp, rows) =>
      assert(rows.map(_.getLong(0)).min === comp)
    }
  }
}
