package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.operators.Similarity

/** Dev probe: the SAME LSH chain under two twin-id offsets — isolates
  * whether the post-migration q148 sf10 delta is id-dependent (shuffle
  * hashing / codegen on wider longs) or environmental.
  * Usage: runMain graft.tools.ProbeOffset [dir]
  */
object ProbeOffset {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/tmp/sf10"
    val spark = GraftSession.local(32, "graft-probe-offset")
    spark.sparkContext.setLogLevel("WARN")
    def chain(off: Long): Unit = {
      val base = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), expr("cast(embedding as array<double>)").as("v"))
      val corpus = base.unionByName(base.select((col("vec_id") + lit(off)).as("vec_id"),
        expr("transform(v, (x, i) -> x + 0.25d * element_at(v, pmod(i + 1, size(v)) + 1))")
          .as("v"))).localCheckpoint(true)
      val n = corpus.count()
      val (b, t) = Similarity.lshParams(n, 0.95)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = Similarity.lshNearDupPairs(corpus, "vec_id", "v", 0.95,
          nPlanes = b, nTables = t).count()
        println(f"[probe-offset] off=$off run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c pairs, b=$b t=$t)")
      }
      corpus.unpersist()
    }
    chain(1000000L)
    chain(1000000000000000L)
    spark.stop()
  }
}
