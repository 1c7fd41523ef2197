package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe: q128 SemDeDup same-cell twin-recall and dedup rates per
  * fixture dir — measures the floor the q128 contract boolean pins.
  * Usage: runMain graft.tools.ProbeSemRate [dir ...]
  */
object ProbeSemRate {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.local(16, "graft-probe-semrate")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    dirs.foreach { d =>
      val corpus = graft.queries.Vector.plantedCorpus(spark, d).localCheckpoint(true)
      val res = graft.queries.Vector.q128_kernel(spark, d).localCheckpoint(true)
      val twinCand = corpus.filter($"vec_id" < 1000000000000000L)
        .select($"vec_id".as("a_id"), ($"vec_id" + 1000000000000000L).as("b_id"))
      val twins = graft.operators.Similarity
        .verifyPairs(corpus, "vec_id", "v", 0.9, twinCand)
        .select($"a_id", $"b_id").localCheckpoint(true)
      val nTwins = twins.count()
      val cells = res.select($"vec_id", array($"cell", $"cell2").as("pcs"), $"keep")
      val tc = twins
        .join(cells.select($"vec_id".as("a_id"), $"pcs".as("pa"), $"keep".as("ka")), "a_id")
        .join(cells.select($"vec_id".as("b_id"), $"pcs".as("pb"), $"keep".as("kb")), "b_id")
        .localCheckpoint(true)
      val nSame = tc.filter(arrays_overlap($"pa", $"pb")).count()
      val nDedup = tc.filter(!($"ka" && $"kb")).count()
      println(f"[semrate] $d nTwins=$nTwins sharedProbe=$nSame (${nSame.toDouble / nTwins}%.4f) " +
        f"deduped=$nDedup (${nDedup.toDouble / nTwins}%.4f)")
    }
    spark.stop()
  }
}
