package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Relational, Relational2, Relational3, Temporal, Text, Vector}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the declared operator surface (one entry per implemented
  * operator family from SURVEY.md §2 plus the north_star LLM-pipeline ops);
  * `oracleSql` carries the DuckDB-equivalent SQL for every query whose
  * semantics are SQL-expressible. Column names and types are aligned
  * between both sides (the driver sorts columns by name and hashes values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.ensureRuntimeConfs(spark)
    Relational.q01_pricing_summary(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. Each function is
    * wrapped to pin runtime confs (UTC, nanos-parquet handling) so queries
    * behave identically under a driver-provided session.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    (Relational.queries ++ Relational2.queries ++ Relational3.queries ++
      Temporal.queries ++ Text.queries ++ Vector.queries)
      .map { case (name, fn) =>
        name -> { (s: SparkSession, d: String) =>
          GraftSession.ensureRuntimeConfs(s)
          fn(s, d)
        }
      }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. The hash-seeded ANN/sketch kernels
    * (q31 minhash bands, q32 simhash, q34 LSH buckets, q42 bucketed ANN,
    * q48 winnowing, q56 IVF, q102 two-level IVF) are oracled on their
    * CONTRACTS (the q148 pattern: recall / precision / separation /
    * guarantee booleans plus cross-engine counts DuckDB recomputes from
    * scratch). Omitted only where the OUTPUT is the non-SQL-expressible
    * contract — q116_pca_project (Jacobi eigenvectors),
    * q128_semantic_dedup (trained k-means cells),
    * q134_quality_classifier (iterative Newton training),
    * q140_bpe_train / q141_bpe_encode (iterative argmax merge loop):
    * all five are deterministic and pinned to committed golden CSVs
    * (GoldenSpec / graft.tools.Golden.pinned); q67_approx_aggs
    * (engine-specific sketches) is tolerance-spec'd in ApproxSpec.
    *
    * NOTE on q33_cosine_topk (and Vector.bruteForceTopK /
    * Similarity.embeddingNearDupPairs): these are the declared CORRECTNESS
    * ORACLES for the ANN family — deliberately all-pairs O(n²·d). Do not
    * route a production path onto them; the scale paths are q42 (sign-LSH),
    * q45 (bucketed LSH near-dup) and q56 (IVF), plan-locked to equi-joins
    * in PlanSpec.
    */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Relational2.oracle ++ Relational3.oracle ++
      Temporal.oracle ++ Text.oracle ++ Vector.oracle
}
