package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for the LLM-pipeline surface (north_star):
  * exact, MinHash+LSH near-dup, SimHash. All are pure DataFrame plans —
  * shuffles only on hash keys, state bounded per key, no driver-side
  * collection — so they scale linearly with executors at 100 TB.
  *
  * Reference anchor for streaming dedup semantics: [U] flink-table-runtime
  * operators/deduplicate/; the near-dup family is the standard
  * MinHash/SimHash construction (Broder; Charikar) as used by large-scale
  * corpus pipelines.
  */
object Dedup {

  /** Exact dedup on `cols`: one surviving row id (min of `idCol`) per
    * distinct key, plus the duplicate count. A single hash aggregate.
    */
  def exact(df: DataFrame, cols: Seq[String], idCol: String): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Per-document MinHash signature: array of `numHashes` min-hashes over
    * distinct word `shingleLen`-shingles. Seeded re-hashing via
    * xxhash64(shingle, seed) — deterministic, no RNG.
    *
    * Plan shape: explode(shingles) × seeds → groupBy(doc, seed) min →
    * regroup to a signature array. Two hash aggregates, both on keys that
    * scale with data; the signature array is fixed-size state per doc.
    */
  def minHashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      shingleLen: Int = 3): DataFrame = {
    // one aggregate with numHashes min(xxhash64(shingle, seed)) columns:
    // rows explode only by shingle (not shingle × seed), so the shuffle is
    // numHashes× smaller than the naive two-level formulation; shingles
    // come from the codegen'd exploded path (min is duplicate-insensitive,
    // so the distinct pass is skipped)
    val shingled = TextFunctions
      .explodedWordShingles(df, Seq(idCol), textCol, shingleLen, distinctShingles = false)
      .withColumnRenamed("shingle", "__s")
    val minCols = (0 until numHashes).map(i => min(xxhash64(col("__s"), lit(i))).as(s"__mh$i"))
    shingled
      .groupBy(col(idCol))
      .agg(minCols.head, minCols.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"__mh$i")): _*).as("signature"))
  }

  /** LSH banding over MinHash signatures: hash `rowsPerBand`-sized slices
    * of the signature; docs sharing any band hash are near-dup candidates.
    * Returns (id, band, band_key).
    */
  def minHashBands(signatures: DataFrame, idCol: String, bands: Int): DataFrame = {
    signatures
      .withColumn("__band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("band_key",
        xxhash64(col("__band"),
          slice(col("signature"),
            col("__band") * (size(col("signature")) / bands) + 1,
            size(col("signature")) / bands)))
      .select(col(idCol), col("__band").as("band"), col("band_key"))
  }

  /** Candidate near-dup pairs from LSH buckets (id_a < id_b, distinct). */
  def minHashCandidates(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16, shingleLen: Int = 3): DataFrame = {
    val sigs = minHashSignatures(df, idCol, textCol, numHashes, shingleLen)
    val banded = minHashBands(sigs, idCol, bands)
    val a = banded.select(col("band"), col("band_key"), col(idCol).as("id_a"))
    val b = banded.select(col("band").as("band_b"), col("band_key").as("key_b"),
      col(idCol).as("id_b"))
    a.join(b, col("band") === col("band_b") && col("band_key") === col("key_b") &&
        col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** 64-bit SimHash over word-token xxhash64 values: bit j of the result is
    * set iff more token hashes have bit j set than not. Near-dups have
    * small Hamming distance. Plan: explode(tokens × 64 bit positions) →
    * two hash aggregates — heavy fan-out but fully distributed.
    */
  def simHash(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("__tok"))
      .withColumn("__h", xxhash64(col("__tok")))
      .withColumn("__j", explode(sequence(lit(0), lit(63))))
      .withColumn("__w", expr("CASE WHEN (shiftright(__h, __j) & 1L) = 1L THEN 1 ELSE -1 END"))
      .groupBy(col(idCol), col("__j"))
      .agg(sum(col("__w")).as("__s"))
      .groupBy(col(idCol))
      .agg(sum(when(col("__s") > 0, expr("shiftleft(1L, __j)")).otherwise(lit(0L)))
        .as("simhash"))
}
