package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming embedding-drift monitor — the vector counterpart of
  * [[DriftMonitor]] (north_star similarity QA): every event-time window,
  * each source's embeddings are compared against a STATIC reference
  * centroid (trained offline on the accepted corpus, a dim-sized literal
  * broadcast with the plan) and the window's mean/min cosine to the
  * centroid is emitted. The alert an embedding-ingest pipeline wires
  * ahead of the ANN index build: a shard whose encoder drifted (model
  * redeploy, corrupted batch, wrong modality) shows a mean-cosine drop
  * long before index recall degrades.
  *
  * Batch/stream-unified per SURVEY.md §7.0: the same body works on a
  * `spark.read` frame and a watermarked `readStream` — one codegen'd
  * [[graft.functions.DotProduct]] per row against the literal centroid,
  * then an ordinary windowed aggregate. No shuffle carries a vector:
  * only (window, source) scalar partials move.
  */
object VectorDrift {

  private def l2(c: Column): Column = sqrt(aggregate(c, lit(0.0d), (a, x) => a + x * x))

  /** Offline reference centroid: the L2-normalized mean vector of the
    * accepted corpus (ONE mergeable dim-sized aggregate; the collect is
    * a single dim-sized row — the documented broadcast contract).
    */
  def referenceCentroid(docs: DataFrame, vecCol: String): Array[Double] = {
    val dim = docs.select(size(col(vecCol))).head().getInt(0)
    val sums = docs.select(
      (0 until dim).map(i => sum(element_at(col(vecCol), i + 1)).as(s"s$i")): _*)
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    val n = math.sqrt(sums.map(x => x * x).sum)
    if (n == 0) sums else sums.map(_ / n)
  }

  /** Per-(window, source) cosine-to-centroid stats of the windowed
    * stream. `stream` needs (ts, source, vecCol) and — when streaming —
    * a watermark on `ts`.
    */
  def centroidDrift(stream: DataFrame, centroid: Array[Double], vecCol: String,
      windowSize: String): DataFrame = {
    val c = array(centroid.map(x => lit(x)): _*)
    val cos = graft.functions.DotProduct(col(vecCol).cast("array<double>"), c) /
      (l2(col(vecCol).cast("array<double>")) * l2(c))
    stream
      .select(col("ts"), col("source"), cos.as("cos"))
      .groupBy(window(col("ts"), windowSize).as("w"), col("source"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("cos")), 4).as("mean_cos"),
        round(min(col("cos")), 4).as("min_cos"))
      .select(col("w.start").as("wstart"), col("source"),
        col("n_vecs"), col("mean_cos"), col("min_cos"))
  }
}
