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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_privacy_agg" -> (q22PrivacyAgg _))

  val oracles: Map[String, String] = Map(
    "q22_privacy_agg" -> q22Sql)
}
