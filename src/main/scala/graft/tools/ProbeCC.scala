package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.functions._

object ProbeCC {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(16, "graft-probe-cc")
    var t0 = System.nanoTime()
    val pairs = graft.operators.Similarity
      .lshNearDupPairs(Tables.embeddings(spark, dir), "vec_id", "embedding", 0.40)
      .select(col("a_id"), col("b_id"))
      .localCheckpoint(true)
    println(f"[cc] pairs: ${pairs.count()} in ${(System.nanoTime()-t0)/1e9}%.2f s")
    t0 = System.nanoTime()
    val comp = graft.operators.Dedup.connectedComponents(pairs, "a_id", "b_id")
    comp.write.mode("overwrite").format("noop").save()
    println(f"[cc] components in ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
