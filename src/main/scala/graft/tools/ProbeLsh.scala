package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Similarity

/** Dev tool: recall of lshNearDupPairs vs the exact all-pairs kernel for
  * a range of table counts, at a given fixture scale.
  */
object ProbeLsh {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = GraftSession.local(8, "graft-probe-lsh")
    val emb = Tables.embeddings(spark, dir)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(
      Similarity.embeddingNearDupPairs(emb, "vec_id", "embedding", 0.35))
    println(s"[probe-lsh] exact pairs: ${exact.size}")
    Seq(8, 10, 12, 14, 16, 20, 24).foreach { t =>
      val got = pairSet(Similarity.lshNearDupPairs(
        emb, "vec_id", "embedding", 0.35, nPlanes = 2, nTables = t))
      println(s"[probe-lsh] t=$t missed=${(exact -- got).size} extra=${(got -- exact).size}")
    }
    spark.stop()
  }
}
