package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Dev probe (r15): where does q90's wall go? Measures the pair-graph
  * volume at the oracle-bound 0.40 threshold and times the candidate
  * generation, exact verify, and union-find stages separately.
  *
  * Usage: runMain graft.tools.ProbeQ90 [dir]
  */
object ProbeQ90 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "graft-probe-q90")
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, dir)
    println(s"[q90] n_emb=${emb.count()}")
    // replicate lshNearDupPairs' internals to time each stage
    val n = emb.select(col("vec_id").as("a_id"),
      expr("cast(embedding as array<double>)").as("va"))
    var t0 = System.nanoTime()
    val buckets = n.select(col("a_id"),
      posexplode(graft.functions.LshBucketsExpr(col("va"), 2, 64, 16))
        .as(Seq("table", "bucket"))).localCheckpoint(true)
    println(f"[q90] index rows=${buckets.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val bb = buckets.select(col("a_id").as("b_id"), col("table").as("tb"),
      col("bucket").as("bucket_b"))
    val cand = buckets.join(bb,
      col("table") === col("tb") && col("bucket") === col("bucket_b") &&
        col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
    println(f"[q90] raw candidates=${cand.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val dis = cand.distinct().localCheckpoint(true)
    println(f"[q90] distinct candidates=${dis.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    Similarity.verifyPairs(emb, "vec_id", "embedding", 0.40, dis)
      .write.mode("overwrite").format("noop").save()
    println(f"[q90] verify in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val pairs = Similarity
      .lshNearDupPairs(emb, "vec_id", "embedding", 0.40)
      .select(col("a_id"), col("b_id")).localCheckpoint(true)
    println(f"[q90] pairs(cos>=0.40)=${pairs.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    (1 to 2).foreach { i =>
      t0 = System.nanoTime()
      Dedup.connectedComponents(pairs, "a_id", "b_id")
        .write.mode("overwrite").format("noop").save()
      println(f"[q90] cc rep$i in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
