package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: dump `.explain("formatted")` for declared queries so the
  * scale posture is inspectable — PushedFilters/ReadSchema on scans,
  * broadcast vs shuffle joins, WholeStageCodegen spans.
  *
  * Usage: runMain graft.tools.Explain [sfDir] [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(8, "graft-explain")
    names.foreach { n =>
      println(s"\n======== $n ========")
      try SparkEntry.queries(n)(spark, dir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
