package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.privacy.{AggregationThresholdPolicy, PolicyCatalog}

/** Clean-room query surface (O22/O23): a policy view over `orders` with an
  * aggregation-threshold policy, queried through plain SQL. The DuckDB
  * oracle states the policy's documented rewrite explicitly
  * (`HAVING count(DISTINCT unit) >= threshold`) — the Spark side never
  * writes that HAVING; the injected Catalyst rule adds it.
  */
object PrivacyQueries {

  /** q22_privacy_agg — daily order stats through the policy view. Groups
    * backed by fewer than 2 distinct customers are suppressed by the rule. */
  def q22PrivacyAgg(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    Tables.orders(s, dir).createOrReplaceTempView("orders_pp_base")
    s.sql("CREATE OR REPLACE TEMP VIEW orders_pp AS SELECT * FROM orders_pp_base")
    PolicyCatalog.setPolicy(s, "orders_pp", AggregationThresholdPolicy("o_custkey", 2))
    s.sql(
      """SELECT o_orderdate, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders_pp
        |GROUP BY o_orderdate
        |ORDER BY o_orderdate""".stripMargin)
  }

  val q22Sql: String =
    """SELECT o_orderdate, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY o_orderdate
      |HAVING count(DISTINCT o_custkey) >= 2
      |ORDER BY o_orderdate""".stripMargin

  /** q167_masked_view — dynamic data masking, the COLUMN-level-security
    * half of the clean room (BigQuery policy tags / data masking; q22's
    * aggregation threshold is the ROW half): subscribers query a masking
    * VIEW where the name keeps only its 3-char suffix, the key becomes a
    * joinable-but-irreversible 48-bit md5 token, and the balance
    * generalizes to its 1000-unit bucket — utility (group counts,
    * distinct-entity counts, histograms) survives, raw identifiers never
    * leave the view. The masks are pure SQL expressions
    * ([[graft.sql.CleanRoom.MaskRule]]), so pushdown/pruning survive the
    * view and the oracle replays the mask text verbatim on the raw
    * table — the masked aggregate must match the
    * mask-then-aggregate-in-SQL answer exactly. */
  def q167MaskedView(s: SparkSession, dir: String): DataFrame = {
    import graft.sql.CleanRoom
    Tables.customer(s, dir).createOrReplaceTempView("customer_raw_q167")
    CleanRoom.createMaskingView(s, "customer_masked_q167", "customer_raw_q167",
      Map("c_name" -> CleanRoom.SuffixMask(3),
        "c_custkey" -> CleanRoom.HashMask,
        "c_acctbal" -> CleanRoom.BucketMask(1000)))
    s.sql(
      """SELECT c_mktsegment, CAST(c_acctbal AS BIGINT) AS bal_bucket,
        |  count(*) AS n, count(DISTINCT c_custkey) AS n_tokens,
        |  min(c_name) AS sample_masked
        |FROM customer_masked_q167
        |GROUP BY 1, 2 ORDER BY c_mktsegment, bal_bucket""".stripMargin)
  }

  val q167Sql: String =
    """WITH m AS (
      |  SELECT c_mktsegment,
      |    concat(repeat('*', greatest(length(c_name) - 3, 0)),
      |           right(c_name, 3)) AS c_name,
      |    substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12) AS c_custkey,
      |    floor(c_acctbal / 1000) * 1000 AS c_acctbal
      |  FROM customer)
      |SELECT c_mktsegment, CAST(c_acctbal AS BIGINT) AS bal_bucket,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_tokens,
      |  min(c_name) AS sample_masked
      |FROM m GROUP BY 1, 2 ORDER BY c_mktsegment, bal_bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q167_masked_view" -> (q167MaskedView _),
    "q22_privacy_agg" -> (q22PrivacyAgg _))

  val oracles: Map[String, String] = Map(
    "q167_masked_view" -> q167Sql,
    "q22_privacy_agg" -> q22Sql)
}
