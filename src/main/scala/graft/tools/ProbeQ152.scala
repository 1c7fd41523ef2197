package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev probe: q152 exact-substring dedup wall at two scales (sf0.1 and
  * the /tmp/sf10 100x replica) — the BASELINE scale row. Prints one
  * JSON line per scale with wall seconds and output aggregates so the
  * reading is attributable.
  */
object ProbeQ152 {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf10")
    val spark = GraftSession.local(32, "graft-probe-q152")
    spark.sparkContext.setLogLevel("WARN")
    // warm the JIT on the small scale so the timed runs compare fairly
    SparkEntry.queries("q152_substring_dedup")(spark, "/root/testdata/sf0.01")
      .write.mode("overwrite").format("noop").save()
    dirs.foreach { d =>
      val t0 = System.nanoTime()
      SparkEntry.queries("q152_substring_dedup")(spark, d)
        .write.mode("overwrite").format("noop").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val agg = SparkEntry.queries("q152_substring_dedup")(spark, d)
        .selectExpr("count(*) AS docs", "sum(n_dup_spans) AS spans",
          "sum(n_dup_tokens) AS dup_toks", "sum(n_tokens) AS toks").head()
      println(f"""{"probe":"q152","dir":"$d","sec":$sec%.3f,"docs":${agg.getLong(0)},"spans":${agg.getLong(1)},"dup_tokens":${agg.getLong(2)},"tokens":${agg.getLong(3)}}""")
    }
    spark.stop()
  }
}
