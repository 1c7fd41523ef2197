package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.{Dedup, Similarity}

/** Dev probe: decompose q148's cost at a dir — LSH chain vs twin
  * verification vs CC — to attribute the post-id-migration sf10 delta
  * (the twin-verify side now covers the FULL planted set).
  * Usage: runMain graft.tools.ProbeQ148 [dir]
  */
object ProbeQ148 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/tmp/sf10"
    val spark = GraftSession.local(32, "graft-probe-q148")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe-q148] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val corpus = time("corpus") {
      graft.queries.Vector.plantedCorpus(spark, dir).localCheckpoint(true)
    }
    val n = corpus.count()
    val (b, t) = Similarity.lshParams(n, 0.95)
    val found = time("lsh chain") {
      val f = Similarity.lshNearDupPairs(corpus, "vec_id", "v", 0.95,
        nPlanes = b, nTables = t).select($"a_id", $"b_id").localCheckpoint(true)
      f.count(); f
    }
    val off = 1000000000000000L
    val twinCand = corpus.filter($"vec_id" < off)
      .select($"vec_id".as("a_id"), ($"vec_id" + off).as("b_id"))
    val twins = time("verifyPairs over full twin set") {
      val tw = Similarity.verifyPairs(corpus, "vec_id", "v", 0.95, twinCand)
        .select($"a_id", $"b_id").localCheckpoint(true)
      tw.count(); tw
    }
    time("hits semi-join") {
      twins.join(found, Seq("a_id", "b_id"), "left_semi").count()
    }
    time("cc + counts") {
      val cc = Dedup.connectedComponents(found, "a_id", "b_id")
      (cc.count(), cc.select($"component").distinct().count())
    }
    spark.stop()
  }
}
