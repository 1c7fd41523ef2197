package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe: the MEASURED values behind the contract-floor booleans
  * (q56/q102 twin recall@3, q134 accuracy) at a fixture dir — the
  * r12 verdict's next #8 asks floors to sit within ~5 points of the
  * worst three-scale measurement, which needs the numbers, not the
  * booleans. Usage: runMain graft.tools.ProbeFloors [dir ...]
  */
object ProbeFloors {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-probe-floors")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    dirs.foreach { d =>
      val corpus = graft.queries.Vector.contractCorpus(spark, d).localCheckpoint(true)
      val nTwins = corpus.filter($"vec_id" >= 1000000000000000L).count()
      val r56 = graft.operators.Similarity
        .ivfTopK(corpus, "vec_id", "v", k = 3, nCells = 0, nProbe = 4)
        .filter($"neighbor_id" === $"a_id" + 1000000000000000L).count()
        .toDouble / nTwins
      val r102 = graft.operators.Similarity.ivfTopK2(
        corpus, "vec_id", "v", k = 3,
        nCoarse = 0, nFinePerCell = 0, nProbeCoarse = 4, nProbeFine = 8)
        .filter($"neighbor_id" === $"a_id" + 1000000000000000L).count()
        .toDouble / nTwins
      // q134's floor is per-source: the binding measurement is the MIN
      val acc134 = graft.queries.Text.q134_kernel(spark, d)
        .agg(min($"accuracy")).head().getDouble(0)
      println(f"[floors] $d q56_recall3=$r56%.4f q102_recall3=$r102%.4f " +
        f"q134_accuracy=$acc134%.4f nTwins=$nTwins")
    }
    spark.stop()
  }
}
