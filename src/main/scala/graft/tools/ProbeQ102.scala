package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Similarity

/** Dev probe: decompose q102's contract cost at a given dir — the bare
  * ivfTopK2 kernel on the planted contract corpus vs the full contract
  * (counts + recall join) — to attribute the sf10 ratio between the
  * kernel's clustering-sensitivity and the contract scaffolding.
  * Usage: runMain graft.tools.ProbeQ102 [dir]
  */
object ProbeQ102 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/tmp/sf10"
    val spark = GraftSession.local(32, "graft-probe-q102")
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe-q102] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val corpus = time("corpus build+checkpoint") {
      graft.queries.Vector.contractCorpus(spark, dir).localCheckpoint(true)
    }
    val n = corpus.count()
    println(s"[probe-q102] corpus n=$n")
    (1 to 2).foreach { i =>
      time(s"bare ivfTopK2 on contract corpus (run $i)") {
        Similarity.ivfTopK2(corpus, "vec_id", "v", k = 3,
          nCoarse = 0, nFinePerCell = 0, nProbeCoarse = 4, nProbeFine = 8)
          .agg(count(lit(1))).head()
      }
      time(s"full q102 contract (run $i)") {
        graft.queries.Vector.q102_ivf2_topk(spark, dir).head()
      }
    }
    // clustering sensitivity: the same kernel on the UNPLANTED base
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr("cast(embedding as array<double>)").as("v"))
      .localCheckpoint(true)
    println(s"[probe-q102] base n=${base.count()}")
    (1 to 2).foreach { i =>
      time(s"bare ivfTopK2 on base corpus (run $i)") {
        Similarity.ivfTopK2(base, "vec_id", "v", k = 3,
          nCoarse = 0, nFinePerCell = 0, nProbeCoarse = 4, nProbeFine = 8)
          .agg(count(lit(1))).head()
      }
    }
    spark.stop()
  }
}
