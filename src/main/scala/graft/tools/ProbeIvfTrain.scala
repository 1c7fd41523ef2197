package graft.tools

import graft.GraftSession
import graft.operators.Similarity

/** Dev probe: offline k-means training cost + trained-vs-hashed recall
  * at sf1 (BASELINE.md scale record for the round-7 `trainIters` path).
  */
object ProbeIvfTrain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "tmp/sf1"
    val spark = GraftSession.local(32, "graft-probe-ivftrain")
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, dir)
    val nVec = emb.count()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, tTrain) = time {
      Similarity.trainCentroids(emb, "vec_id", "embedding", nCells = 64, iters = 5)
    }
    val (nHashed, tHashed) = time {
      Similarity.ivfTopK2(emb, "vec_id", "embedding", k = 3,
        nCoarse = 64, nFinePerCell = 16, nProbeCoarse = 4, nProbeFine = 8).count()
    }
    val (nTrained, tTrained) = time {
      Similarity.ivfTopK2(emb, "vec_id", "embedding", k = 3,
        nCoarse = 64, nFinePerCell = 16, nProbeCoarse = 4, nProbeFine = 8,
        trainIters = 5).count()
    }
    println(f"[ivftrain] $nVec vectors: train(64 cells, 5 iters)=${tTrain}%.1f s; " +
      f"query hashed=${tHashed}%.1f s ($nHashed rows), " +
      f"trained=${tTrained}%.1f s ($nTrained rows, incl. training)")
    spark.stop()
  }
}
