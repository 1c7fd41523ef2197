package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.operators.Similarity

/** Dev probe for the sf1 scale record (BASELINE.md): times the vector
  * paths whose cost structure changes with n —
  *   1. ivfTopK with auto cells (the q56 fix) vs the old fixed 32;
  *   2. lshNearDupPairs at a REALISTIC near-dup threshold (0.9) with
  *      formula-derived (nPlanes, nTables), next to the fixture-pinned
  *      0.35 run the bench already measures.
  * Usage: runMain graft.tools.ProbeScale <dir> [reps]
  */
object ProbeScale {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/repo/tmp/sf1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.local(32, "graft-probescale")
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    val (b, t) = Similarity.lshParams(n, 0.9)
    println(s"[probescale] n=$n lshParams(0.9) -> nPlanes=$b nTables=$t")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val c = mk.count()
        println(f"[probescale] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
      }

    time("ivf_auto_cells")(
      Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3, nCells = 0, nProbe = 4))
    time("ivf_fixed_32")(
      Similarity.ivfTopK(emb, "vec_id", "embedding", k = 3, nCells = 32, nProbe = 4))
    time("neardup_t0.9_formula")(
      Similarity.lshNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.9, nPlanes = b, nTables = t))
    // round-9 additions: the new shuffle shapes whose cost moves with n.
    // SemDeDup twice: fixed cells (per-cell pair work grows n²/c — the
    // anti-pattern) vs cells ∝ n (constant occupancy — the method's
    // linear scale path).
    time("semantic_dedup_c64")(
      Similarity.semanticDedup(emb, "vec_id", "embedding",
        nCells = 64, threshold = 0.9))
    time(s"semantic_dedup_c${n / 30}")(
      Similarity.semanticDedup(emb, "vec_id", "embedding",
        nCells = (n / 30).toInt, threshold = 0.9))
    time(s"semantic_dedup_c${n / 30}_uncapped")(
      Similarity.semanticDedup(emb, "vec_id", "embedding",
        nCells = (n / 30).toInt, threshold = 0.9,
        trainSampleCap = Int.MaxValue))
    time("span_dedup")(
      graft.queries.Text.q124_span_dedup(spark, dir))
    time("source_kl")(
      graft.queries.Text.q130_source_kl(spark, dir))
    spark.stop()
  }
}
