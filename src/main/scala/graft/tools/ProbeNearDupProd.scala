package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Similarity}

/** Dev probe for the q119/q120 family's 10× scale posture: the same
  * orig-union-neardup corpus construction, but with the PRODUCTION
  * recall target (0.99) instead of the six-nines the hash-exact
  * correctness gate pins — the gate's table count (t≈33 at sf1 sizes)
  * exists to make a deterministic fixture miss a ~1e-3 event and is a
  * correctness-harness artifact, not the deployment rule. Reports pair
  * and component counts so the recall story stays visible.
  * Usage: runMain graft.tools.ProbeNearDupProd <dir> [reps]
  */
object ProbeNearDupProd {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/tmp/sf1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.local(32, "graft-probe-ndprod")
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("cast(embedding as array<double>)").as("v"))
    val dup = base.select((col("vec_id") + lit(10000000L)).as("vec_id"),
      expr("transform(v, (x, i) -> x + 0.25d * element_at(v, pmod(i + 1, size(v)) + 1))")
        .as("v"))
    val corpus = base.unionByName(dup).localCheckpoint(true)
    val n = corpus.count()
    val (b, t) = Similarity.lshParams(n, 0.95, targetRecall = 0.99)
    println(s"[ndprod] n=$n lshParams(0.95, recall=0.99) -> nPlanes=$b nTables=$t")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val pairs = Similarity
        .lshNearDupPairs(corpus, "vec_id", "v", 0.95, nPlanes = b, nTables = t)
        .select(col("a_id"), col("b_id")).localCheckpoint(true)
      val nPairs = pairs.count()
      val t1 = System.nanoTime()
      val nComp = Dedup.connectedComponents(pairs, "a_id", "b_id")
        .select(col("component")).distinct().count()
      val t2 = System.nanoTime()
      println(f"[ndprod] run$i pairs=$nPairs in ${(t1 - t0) / 1e9}%.2f s; " +
        f"components=$nComp in +${(t2 - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
