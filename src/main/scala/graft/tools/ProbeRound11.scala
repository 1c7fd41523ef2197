package graft.tools

import org.apache.spark.sql.DataFrame
import graft.GraftSession

/** Dev probe for the round-11 sf1 scale record: times the new operators
  * against the 10× replica — the window outer/semi/anti joins (ordinary
  * window-keyed equi-joins), DSIR importance weighting (one corpus pass +
  * broadcast log-ratio table), and BPE merge training (one corpus scan to
  * a word histogram; the merge loop iterates on the vocabulary only, so
  * its cost must be sub-linear in corpus size).
  * Usage: runMain graft.tools.ProbeRound11 <dir> [reps]
  */
object ProbeRound11 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/tmp/sf1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.local(32, "graft-probe-r11")
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(mk: => DataFrame): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val c = mk.count()
        println(f"[probe-r11] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      }

    time("q137_window_outer_join")(
      graft.queries.Temporal.q137_window_outer_join(spark, dir))
    time("q138_window_semi_anti")(
      graft.queries.Temporal.q138_window_semi_anti(spark, dir))
    time("q139_dsir_weights")(
      graft.queries.Text.q139_dsir_weights(spark, dir))
    time("q140_bpe_train")(
      graft.queries.Text.q140_bpe_train(spark, dir))
    time("q141_bpe_encode")(
      graft.queries.Text.q141_bpe_encode(spark, dir))
    spark.stop()
  }
}
