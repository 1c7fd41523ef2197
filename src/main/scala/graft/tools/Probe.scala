package graft.tools

import graft.{GraftSession, Tables}

/** Dev-only smoke probe: prints fixture schemas under the graft session. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(8, "graft-probe")
    for (t <- Seq("events", "embeddings", "lineitem")) {
      val df = Tables(spark, dir, t)
      println(s"== $t ==")
      df.printSchema()
      df.show(3, truncate = false)
    }
    val e = graft.SparkEntry.entry(spark)
    println(s"entry() rows = ${e.count()}")
    e.show(10, truncate = false)
    spark.stop()
  }
}
