package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Similarity

/** Dev probe: measured recall of the PRODUCTION lshParams target (0.99)
  * on the q119/q120 planted corpus at each fixture SF, vs the exact
  * all-pairs kernel — decides whether the q148 production-recall chain
  * can carry a hash-exact DuckDB oracle at the fixtures (recall = 1 with
  * the deterministic seeded planes) or must gate on the recall-floor
  * spec alone. Usage: runMain graft.tools.ProbeProdRecall [dirs...]
  */
object ProbeProdRecall {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "graft-probe-prodrecall")
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { dir =>
      val corpus = graft.queries.Vector.plantedCorpus(spark, dir).localCheckpoint(true)
      val n = corpus.count()
      val (b, t) = Similarity.lshParams(n, 0.95)
      val exact = Similarity.embeddingNearDupPairs(corpus, "vec_id", "v", 0.95)
        .select(col("a_id"), col("b_id")).localCheckpoint(true)
      val found = Similarity.lshNearDupPairs(corpus, "vec_id", "v", 0.95,
        nPlanes = b, nTables = t).select(col("a_id"), col("b_id"))
      val nExact = exact.count()
      val nFound = found.count()
      val nHit = exact.intersect(found).count()
      println(f"[prodrecall] $dir n=$n b=$b t=$t exact=$nExact found=$nFound " +
        f"hit=$nHit recall=${nHit.toDouble / math.max(1, nExact)}%.6f")
    }
    spark.stop()
  }
}
