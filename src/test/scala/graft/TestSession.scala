package graft

import org.apache.spark.sql.SparkSession

/** One local session shared by every suite (forked test JVM). */
object TestSession {
  lazy val spark: SparkSession = Sessions.local("8")
}
