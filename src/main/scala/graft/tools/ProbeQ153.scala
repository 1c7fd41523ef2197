package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev probe: q153 BM25 retrieval + q154 hybrid-RRF wall at two scales
  * (sf0.1 and the /tmp/sf10 100x replica) — the BASELINE scale rows.
  * Prints one JSON line per (query, scale) with wall seconds and output
  * aggregates so the reading is attributable. Note the replica suffixes
  * every word per copy (vocabulary bijection), so the fixed q153 query
  * terms only match copy 0 — the probe still scans/aggregates the full
  * 100x corpus, which is the scaling term; q154's query docs (doc_id<3)
  * exist in copy 0 likewise.
  */
object ProbeQ153 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf10")
    val spark = GraftSession.local(32, "graft-probe-q153")
    spark.sparkContext.setLogLevel("WARN")
    Seq("q153_bm25_topk", "q154_hybrid_rrf").foreach { q =>
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.01")
        .write.mode("overwrite").format("noop").save() // JIT warm
      dirs.foreach { d =>
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, d)
          .write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val agg = SparkEntry.queries(q)(spark, d)
          .selectExpr("count(*) AS rows", "count(DISTINCT query_id) AS queries")
          .head()
        println(f"""{"probe":"$q","dir":"$d","sec":$sec%.3f,"rows":${agg.getLong(0)},"queries":${agg.getLong(1)}}""")
      }
    }
    spark.stop()
  }
}
