package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession shared by every suite (single forked test JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = Sessions.local("4")
}
