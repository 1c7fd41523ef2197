package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor — the ingest-time version of the
  * batch per-source KL score (queries.Text.q130): every event-time
  * window, each source's unigram distribution is compared against a
  * STATIC reference distribution (trained offline on the accepted
  * corpus, broadcast to the stream) and the window's KL divergence
  * KL(P_window,src ‖ P_ref) is emitted. The alert a 100 TB ingest
  * pipeline wires ahead of the curation stages: a crawl shard whose
  * drift spikes gets quarantined before it pollutes the mix.
  *
  * Batch/stream-unified per SURVEY.md §7.0: the same function body
  * works on a `spark.read` frame (spec oracle path) and a
  * watermarked `readStream` (deployment path) — the per-(window,
  * source, term) counts are a windowed streaming aggregate, the
  * reference join is a stream-static broadcast join, and the final
  * per-(window, source) fold is a second windowed aggregate.
  *
  * Terms unseen in the reference get `smoothing` probability mass
  * (unsmoothed KL would be infinite on any novel term — the standard
  * add-ε treatment); the reference side should be built with
  * [[referenceDistribution]] so both sides share the term extractor.
  */
object DriftMonitor {

  private def terms(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** Offline reference: term → probability over the corpus (the
    * broadcast side; vocabulary-sized, not corpus-sized).
    */
  def referenceDistribution(docs: DataFrame, textCol: String): DataFrame = {
    val t = docs.select(explode(terms(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val tot = t.agg(sum(col("c")).as("t"))
    t.crossJoin(broadcast(tot))
      .select(col("term"), (col("c").cast("double") / col("t")).as("p_ref"))
  }

  /** Per-(window, source) KL divergence of the windowed stream against
    * `reference` (from [[referenceDistribution]]). `stream` needs
    * (ts, source, textCol) and — when streaming — a watermark on `ts`.
    */
  def sourceDrift(stream: DataFrame, reference: DataFrame, textCol: String,
      windowSize: String, smoothing: Double = 1e-6): DataFrame = {
    val counted = stream
      .select(col("ts"), col("source"), explode(terms(col(textCol))).as("term"))
      .groupBy(window(col("ts"), windowSize).as("w"), col("source"), col("term"))
      .agg(count(lit(1)).as("cs"))
    counted
      .join(broadcast(reference), Seq("term"), "left")
      .withColumn("p_ref", coalesce(col("p_ref"), lit(smoothing)))
      .groupBy(col("w"), col("source"))
      .agg(sum(col("cs")).as("n_tokens"),
        sum(col("cs") * log(col("cs") / col("p_ref"))).as("__partial"))
      // KL = Σ (cs/N) ln((cs/N)/p_ref) = (1/N) Σ cs ln(cs/p_ref) − ln N
      .select(col("w.start").as("wstart"), col("source"), col("n_tokens"),
        round(col("__partial") / col("n_tokens") - log(col("n_tokens")), 6).as("kl"))
  }
}
