package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test run (sessions are expensive;
  * suites only need a planner + a few rows).
  */
object TestSpark {
  lazy val spark: SparkSession = {
    // Pin the JVM default TZ too: java.sql.Timestamp literals in test
    // expectations resolve against it, and the session default derives from
    // it before the conf below applies.
    java.util.TimeZone.setDefault(java.util.TimeZone.getTimeZone("UTC"))
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.expr.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}
