package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe: q128 hier-assignment twin recall AND kernel wall at a
  * fixture dir across (hierCoarseProbes, hierTieEps) settings — the
  * measurement behind the adaptive-escalation knob (VERDICT r12 next #2:
  * close the 0.89-flat vs 0.83-hier recall gap at ≤ 1.3× the kernel).
  * Usage: runMain graft.tools.ProbeTieEps <dir> [probes:eps ...]
  */
object ProbeTieEps {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val settings: Seq[(Int, Double)] =
      if (args.length > 1) args.drop(1).toSeq.map { s =>
        val Array(p, e) = s.split(":"); (p.toInt, e.toDouble)
      } else Seq((3, 0.0), (3, 0.05), (3, 0.1), (4, 0.0), (4, 0.05), (5, 0.0))
    val spark = GraftSession.local(32, "graft-probe-tieeps")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = graft.queries.Vector.plantedCorpus(spark, dir).localCheckpoint(true)
    val twinCand = corpus.filter($"vec_id" < 1000000000000000L)
      .select($"vec_id".as("a_id"), ($"vec_id" + 1000000000000000L).as("b_id"))
    val twins = graft.operators.Similarity
      .verifyPairs(corpus, "vec_id", "v", 0.9, twinCand)
      .select($"a_id", $"b_id").localCheckpoint(true)
    val nTwins = twins.count()
    settings.foreach { case (probes, eps) =>
      val t0 = System.nanoTime()
      val res = graft.operators.Similarity.semanticDedup(corpus, "vec_id", "v",
        nCells = 0, threshold = 0.9, hierCoarseProbes = probes, hierTieEps = eps)
      res.write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val cells = res.select($"vec_id", array($"cell", $"cell2").as("pcs"))
      val nSame = twins
        .join(cells.select($"vec_id".as("a_id"), $"pcs".as("pa")), "a_id")
        .join(cells.select($"vec_id".as("b_id"), $"pcs".as("pb")), "b_id")
        .filter(arrays_overlap($"pa", $"pb")).count()
      println(f"[tieeps] probes=$probes eps=$eps%.3f recall=${nSame.toDouble / nTwins}%.4f " +
        f"wall=$wall%.1f nTwins=$nTwins")
    }
    spark.stop()
  }
}
