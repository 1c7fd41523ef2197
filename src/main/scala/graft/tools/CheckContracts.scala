package graft.tools

import graft.GraftSession

/** Dev probe: every contract query's booleans at an arbitrary fixture
  * dir (the DuckDB gate runs at sf0.01; this confirms the contracts
  * HOLD at bench scale too, where only timings are recorded).
  * Usage: runMain graft.tools.CheckContracts [dir]
  */
object CheckContracts {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(16, "graft-check-contracts")
    spark.sparkContext.setLogLevel("WARN")
    val qs = Seq("q31_minhash_bands", "q32_simhash", "q34_ann_lsh_buckets",
      "q42_ann_topk", "q48_winnow_fingerprints", "q56_ivf_topk",
      "q102_ivf2_topk", "q148_neardup_recall99", "q149_curation_composed",
      "q150_curation_incremental",
      "q67_approx_aggs", "q155_cms_heavy_hitters", "q116_pca_project", "q128_semantic_dedup",
      "q134_quality_classifier", "q140_bpe_train", "q141_bpe_encode")
    var bad = 0
    qs.foreach { q =>
      // EVERY row's booleans, not head() — q134 is per-source and its
      // worst source is exactly what a floor sweep must see (the r13
      // all-rows fix caught q134's sf10 worst source under the old 0.9
      // floor, which head() had skipped)
      val rows = graft.SparkEntry.queries(q)(spark, dir).collect()
      val boolIdx = rows.head.schema.fields.zipWithIndex.collect {
        case (f, i) if f.dataType == org.apache.spark.sql.types.BooleanType => (f.name, i)
      }
      val bools = boolIdx.map { case (name, i) =>
        val allTrue = rows.forall(_.getBoolean(i))
        if (!allTrue) bad += 1
        s"$name=$allTrue"
      }
      println(s"[contracts] $q (${rows.length} rows): ${bools.mkString(" ")}")
    }
    println(s"[contracts] false booleans: $bad")
    spark.stop()
  }
}
