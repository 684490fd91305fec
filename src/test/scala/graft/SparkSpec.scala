package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all specs — one local SparkSession per JVM (tests fork
  * one JVM), small core count so the suite stays fast. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  /** Fresh scratch dir per call, auto-deleted on JVM exit is not needed —
    * tests run in a throwaway container; uniqueness is what matters. */
  def tmpDir(prefix: String): String =
    Files.createTempDirectory(s"graft-$prefix").toString
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local(cores = "4", appName = "graft-test")
}
