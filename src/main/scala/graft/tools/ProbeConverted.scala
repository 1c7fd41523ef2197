package graft.tools

import graft.GraftSession

/** Dev probe: 3-run within-JVM medians for the round-12 contract-
  * converted queries at an arbitrary fixture dir, emitted as a bench-
  * format JSON line (the REPEAT=3 protocol BASELINE requires of
  * single-query probes).
  * Usage: runMain graft.tools.ProbeConverted <dir> <outFile> [names...]
  */
object ProbeConverted {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val out = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq
      else Seq("q67_approx_aggs", "q116_pca_project", "q134_quality_classifier",
        "q140_bpe_train", "q141_bpe_encode", "q128_semantic_dedup")
    val spark = GraftSession.local(32, "graft-probe-converted")
    spark.sparkContext.setLogLevel("WARN")
    val meds = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[converted] $name runs=${ts.map(t => f"$t%.2f").mkString(",")} med=${ts(1)}%.3f")
      name -> ts(1)
    }
    val json = "{" +
      "\"metric\":\"converted_contract_probe\"," +
      f"\"value\":${meds.map(_._2).sum}%.3f," +
      "\"unit\":\"sec\",\"queries\":{" +
      meds.map { case (n, t) => f""""$n":$t%.3f""" }.mkString(",") +
      s"},\"sf\":\"$dir\",\"loadavg\":\"" +
      scala.io.Source.fromFile("/proc/loadavg").getLines().next() + "\"}"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    println(json)
    spark.stop()
  }
}
