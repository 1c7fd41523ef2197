package graft.tools

import graft.{FlinkSql, GraftSession}

/** The sql-client analog: run a Flink SQL script FILE end-to-end on a
  * local session and print the last statement's result. Usage:
  *   runMain graft.tools.RunScript <script.sql> [--stream]
  * `--stream` treats the final statement as a streaming INSERT (or
  * statement set) and awaits its bounded AvailableNow completion.
  */
object RunScript {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: RunScript <script.sql> [--stream]")
    val script = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args(0))), "UTF-8")
    val stream = args.contains("--stream")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt, "graft-run-script")
    spark.sparkContext.setLogLevel("WARN")
    try {
      if (stream) {
        val stmts = FlinkSql.statements(script)
        val qs =
          if (raw"(?is)STATEMENT\s+SET".r.findFirstIn(stmts.last).isDefined)
            FlinkSql.runStreamSet(spark, script)
          else Seq(FlinkSql.runStream(spark, script))
        qs.foreach(_.awaitTermination())
        println(s"[run-script] ${qs.size} streaming insert(s) completed")
      } else {
        FlinkSql.run(spark, script).show(50, truncate = false)
      }
    } finally spark.stop()
  }
}
