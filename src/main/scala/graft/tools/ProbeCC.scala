package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Dev probe for the connected-components scale record (BASELINE.md):
  *
  *  1. end-to-end near-dup clustering at scale parameters — candidate
  *     pairs from `lshParams`-derived sign-LSH at a REALISTIC ≥0.9
  *     threshold (the fixture-pinned 0.40 of q90 is oracle-bound: its
  *     recall=1 tables approach all-pairs at 10× data, the same finding
  *     BASELINE.md records for q45), then the label-propagation loop;
  *  2. the loop alone on a synthetic graph whose size scales with the
  *     fixture (10 chained nodes per block + every-7th cross link), so
  *     the operator's round cost is measured with a non-trivial diameter
  *     even when the real τ0.9 graph is nearly empty.
  *
  * Usage: runMain graft.tools.ProbeCC [dir]
  */
object ProbeCC {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "graft-probe-cc")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val (b, t) = Similarity.lshParams(n, 0.9)
    var t0 = System.nanoTime()
    val pairs = Similarity
      .lshNearDupPairs(emb, "vec_id", "embedding", 0.9, nPlanes = b, nTables = t)
      .select(col("a_id"), col("b_id")).localCheckpoint(true)
    println(f"[cc] n=$n t0.9 (b=$b T=$t) pairs=${pairs.count()} in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    Dedup.connectedComponents(pairs, "a_id", "b_id")
      .write.mode("overwrite").format("noop").save()
    println(f"[cc] components(real) in ${(System.nanoTime() - t0) / 1e9}%.2f s")

    // synthetic graph ~10 edges per embedding row: blocks of 10 chained
    // ids plus a cross link every 7 blocks — components of bounded size
    // with diameter ≥ 10, count scaling with the fixture
    val ids = spark.range(n * 10)
    val chain = ids.filter($"id" % 10 =!= 9).select($"id".as("src"), ($"id" + 1).as("dst"))
    val cross = ids.filter($"id" % 70 === 0)
      .select($"id".as("src"), ($"id" + 19).as("dst"))
    val edges = chain.union(cross)
    t0 = System.nanoTime()
    Dedup.connectedComponents(edges.toDF, "src", "dst")
      .write.mode("overwrite").format("noop").save()
    println(f"[cc] components(synthetic ${n * 10} nodes, auto path) in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    Dedup.connectedComponents(edges.toDF, "src", "dst", localThresholdEdges = 0L)
      .write.mode("overwrite").format("noop").save()
    println(f"[cc] components(synthetic ${n * 10} nodes, forced loop) in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
