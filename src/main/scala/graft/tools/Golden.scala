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

  /** KERNEL surfaces pinned to committed golden CSVs: deterministic
    * (seeded xxhash64 / splitmix64, no RNG) but not SQL-expressible in
    * DuckDB. Round 12 moved every DECLARED query onto a DuckDB oracle —
    * q31/q32/q34/q42/q56/q102 and then q67/q116/q128/q134/q140/q141 ride
    * CONTRACT oracles (the q148 pattern: cross-engine counts DuckDB
    * recomputes from scratch + in-engine certificates pinned TRUE).
    * The trained/selected OUTPUTS those contracts certify (projections,
    * cluster labels, per-source scores, merge tables, per-doc encodes)
    * stay pinned here so a kernel drift fails the suite even when the
    * contract booleans would still hold.
    */
  val pinned: Seq[String] = Seq(
    "q116_pca_project",
    "q128_semantic_dedup",
    "q134_quality_classifier",
    "q140_bpe_train",
    "q141_bpe_encode")

  /** The pinned kernel surface per name — the pre-contract query bodies
    * (shared by [[MakeGolden]] and GoldenSpec so the CSVs keep their
    * original shape).
    */
  val kernelSurface: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame](
      "q116_pca_project" -> graft.queries.Vector.q116_kernel,
      "q128_semantic_dedup" -> graft.queries.Vector.q128_kernel,
      "q134_quality_classifier" -> graft.queries.Text.q134_kernel,
      "q140_bpe_train" -> graft.queries.Text.q140_kernel,
      "q141_bpe_encode" -> graft.queries.Text.q141_kernel)
      .map { case (name, fn) =>
        name -> { (s: org.apache.spark.sql.SparkSession, d: String) =>
          graft.GraftSession.ensureRuntimeConfs(s)
          fn(s, d)
        }
      }

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
