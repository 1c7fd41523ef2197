package graft.tools

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.GraftSession
import graft.streaming.{KeepLastOut, KeyedValue, StatefulOps}

/** Dev tool: minimal reproduction of keepLast-with-TTL streaming. */
object ProbeTtl {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4, "graft-probe-ttl")
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[KeyedValue]
    val q = StatefulOps.keepLast(input.toDS(),
        ttl = org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofMillis(300)))
      .writeStream.outputMode("append").format("memory").queryName("ttl_probe").start()
    println("[probe-ttl] started")
    input.addData(KeyedValue(1L, 1, 10.0))
    q.processAllAvailable()
    println("[probe-ttl] batch 1 done")
    Thread.sleep(1500)
    input.addData(KeyedValue(1L, 2, 20.0))
    q.processAllAvailable()
    println("[probe-ttl] batch 2 done")
    input.addData(KeyedValue(1L, 3, 30.0))
    q.processAllAvailable()
    println("[probe-ttl] batch 3 done")
    spark.table("ttl_probe").as[KeepLastOut].collect().foreach(c => println(s"[probe-ttl] $c"))
    q.stop()
    spark.stop()
  }
}
