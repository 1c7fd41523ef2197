package graft.tools

import org.apache.spark.sql.DataFrame

/** Canonical row serialization shared by the golden-file generator
  * ([[MakeGolden]]) and the test that checks against it (GoldenSpec), so
  * the two can never disagree on formatting. Mirrors the driver's compare
  * contract: columns sorted by name, doubles rounded (1e-6 here — all
  * pinned kernels are deterministic, rounding only guards printf drift),
  * rows sorted lexicographically.
  */
object Golden {

  /** Queries pinned to committed golden CSVs: deterministic (seeded
    * xxhash64 / splitmix64, no RNG) but not SQL-expressible in DuckDB.
    * Round 12 moved q31/q32/q34/q42/q56/q102 OFF this list onto DuckDB
    * contract oracles (the q148 pattern — recall/precision/separation
    * booleans plus cross-engine counts); the remainder stay golden
    * because their OUTPUT is the contract (trained weights, merge
    * tables, eigenvectors, cluster labels).
    */
  val pinned: Seq[String] = Seq(
    "q116_pca_project",
    "q128_semantic_dedup",
    "q134_quality_classifier",
    "q140_bpe_train",
    "q141_bpe_encode")

  def canonical(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    val proj = df.selectExpr(cols.map(c => s"`$c`"): _*)
    proj.collect().map { row =>
      cols.indices.map { i =>
        row.get(i) match {
          case null      => "NULL"
          case d: Double => f"$d%.6f"
          case f: Float  => f"${f.toDouble}%.6f"
          case v         => v.toString
        }
      }.mkString(",")
    }.sorted.toSeq
  }
}
