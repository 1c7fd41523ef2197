package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test JVM (suites are cheap;
  * session startup is not).
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(8, "graft-test")
  val sfDir = "/root/testdata/sf0.001"
}

// Top-level case classes: Spark encoders cannot be derived for classes
// nested inside a test class.
case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
case class AsOfL(k: Int, t: Long, lv: Int)
case class AsOfR(k: Int, t: Long, rv: Int)
case class Raw(key: Long, id: Long, ts: java.sql.Timestamp, value: Double)
