package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM — session
  * startup (~5s) is paid once, not per suite. */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf0001 = "/root/testdata/sf0.001"
}
