package graft.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** The ONE place a possibly-qualified table/view name string becomes a
  * [[TableIdentifier]] — via the session's SQL parser, so backtick quoting
  * and error handling match what `spark.sql` itself would do. (Three ad-hoc
  * `split('.')` copies previously disagreed on quoted and multi-part
  * names.) */
object Names {
  def parseTableIdentifier(spark: SparkSession, name: String): TableIdentifier =
    spark.sessionState.sqlParser.parseTableIdentifier(name)
}
