package graft.tools

import graft.GraftSession

/** Dev probe: attribute q128's sf10 cost — kernel (nProbe 1 vs 2) vs
  * the contract's verification joins.
  * Usage: runMain graft.tools.ProbeSemCost [dir]
  */
object ProbeSemCost {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10"
    val spark = GraftSession.local(32, "graft-probe-semcost")
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[semcost] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val corpus = graft.queries.Vector.plantedCorpus(spark, dir).localCheckpoint(true)
    (1 to 2).foreach { round =>
      time(s"kernel nProbe=1 r$round") {
        graft.operators.Similarity.semanticDedup(corpus, "vec_id", "v",
          nCells = 0, threshold = 0.9, nProbe = 1)
          .write.mode("overwrite").format("noop").save()
      }
      time(s"kernel nProbe=2 r$round") {
        graft.operators.Similarity.semanticDedup(corpus, "vec_id", "v",
          nCells = 0, threshold = 0.9)
          .write.mode("overwrite").format("noop").save()
      }
      time(s"full contract r$round") {
        graft.queries.Vector.q128_semantic_dedup(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
