package graft.tools

import org.apache.spark.sql.DataFrame
import graft.GraftSession

/** Dev probe for the round-10 sf1 scale record: times the new
  * operators whose cost must stay linear in corpus size —
  * quality-classifier training (k scans + k bounded reductions),
  * eval-set decontamination (one scan, broadcast kernel), table-agg
  * Top2 (one shuffle, O(1) accumulators), and the SQL window join.
  * Usage: runMain graft.tools.ProbeRound10 <dir> [reps]
  */
object ProbeRound10 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/tmp/sf1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(32, "graft-probe-r10")
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(mk: => DataFrame): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val c = mk.count()
        println(f"[probe-r10] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      }

    time("q134_quality_classifier")(
      graft.queries.Text.q134_quality_classifier(spark, dir))
    time("q136_eval_decontam")(
      graft.queries.Vector.q136_eval_decontam(spark, dir))
    time("q132_table_agg_top2")(
      graft.queries.Relational3.q132_table_agg_top2(spark, dir))
    time("q135_window_join_sql")(
      graft.queries.Temporal.q135_window_join_sql(spark, dir))
    spark.stop()
  }
}
