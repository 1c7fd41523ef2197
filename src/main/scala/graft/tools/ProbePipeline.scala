package graft.tools

import graft.GraftSession

/** Wall-time the composed north-star pipeline
  * ([[graft.operators.CurationPipeline]]) at a given fixture dir —
  * the round-12 "pipeline at 100×" BASELINE row. Prints one JSON line
  * with the per-stage rows in/out and total wall seconds (medians of
  * `repeat` within-JVM runs, the bench protocol).
  * Usage: runMain graft.tools.ProbePipeline <dir> [repeat]
  */
object ProbePipeline {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val repeat = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(32, "graft-probe-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    val runs = (1 to repeat).map { _ =>
      val t0 = System.nanoTime()
      val rows = graft.operators.CurationPipeline.run(spark, dir).collect()
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, rows)
    }
    val med = runs.map(_._1).sorted.apply(runs.length / 2)
    val stages = runs.head._2.map(r =>
      s"""{"stage":"${r.getString(0)}","rows_in":${r.getLong(1)},"rows_out":${r.getLong(2)}}""")
    println(s"""{"metric":"pipeline_wall","value":${f"$med%.3f"},"unit":"sec",""" +
      s""""dir":"$dir","runs":[${runs.map(r => f"${r._1}%.3f").mkString(",")}],""" +
      s""""stages":[${stages.mkString(",")}]}""")
    spark.stop()
  }
}
