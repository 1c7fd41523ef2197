package graft.tools
import graft.{GraftSession, Tables}
import graft.operators.Similarity
object ProbeIvf2 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/tmp/sf1"
    val spark = GraftSession.local(32, "graft-probe-ivf2")
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    println(s"[ivf2] n=${emb.count()}")
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = mk.count()
        println(f"[ivf2] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      }
    // flat auto path (capped at 256 cells) vs two-level 64x32 = 2048 cells
    time("flat_auto_256")(Similarity.ivfTopK(emb, "vec_id", "embedding", 3, 0, 4))
    time("two_level_64x32")(Similarity.ivfTopK2(emb, "vec_id", "embedding", 3,
      nCoarse = 64, nFinePerCell = 32, nProbeCoarse = 6, nProbeFine = 12))
    spark.stop()
  }
}
