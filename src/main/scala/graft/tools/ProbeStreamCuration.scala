package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe: the INCREMENTAL curation pipeline's throughput — the
  * planted crawl split into 4 id-range files, driven as a REAL
  * streaming query (file source, maxFilesPerTrigger=1 → one micro-batch
  * per file) through StreamingCuration's persistent-store stages.
  * Prints wall, docs/s, and the survivor count (which must match the
  * q149 batch run's stage-4 output — PipelineSpec pins the equality at
  * fixture scale; this probe is the BASELINE throughput row).
  * Usage: runMain graft.tools.ProbeStreamCuration [dir]
  */
object ProbeStreamCuration {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]").appName("graft-probe-streamcuration"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.TextFunctions
    import graft.operators.{CurationPipeline, QualityClassifier, Similarity}

    val tmp = java.nio.file.Files.createTempDirectory("probe_stream_cur").toString
    val (docs, vecs) = CurationPipeline.plantedCrawl(spark, dir)
    val crawl = docs
      .join(vecs.select($"vec_id".as("doc_id"), $"v"), Seq("doc_id"), "left")
      .select($"doc_id", $"text", $"source", $"v").localCheckpoint(true)
    val total = crawl.count()

    // side inputs (periodic batch refreshes in production)
    val nExact = crawl.select(md5($"text")).distinct().count()
    val (b, t) = Similarity.lshParams(nExact, 0.95)
    val evalVecs = vecs.filter($"vec_id" < 200)
      .select($"v").collect().map(_.getSeq[Double](0).toArray)
    val evalShingles = TextFunctions
      .explodedWordShingles(docs.filter($"doc_id" < 200), Seq("doc_id"), "text", 8)
      .select($"shingle").distinct().as[String].collect().toSet
    val labeled = docs
      .select($"doc_id", $"source", $"text",
        TextFunctions.tokenCount($"text").cast("long").as("n_tok"),
        TextFunctions.langScore($"text", TextFunctions.enMarkers).as("n_stop"),
        TextFunctions.punctCount($"text").as("n_punct"),
        length($"text").as("len"))
      .withColumn("y",
        ($"n_tok" >= 5 && $"n_punct" / $"len" <= 0.1 && $"n_stop" > 0).cast("double"))
    val model = QualityClassifier.trainNewton(
      QualityClassifier.featurize(labeled, "text", 64), "f", "y", 64, iters = 5)
    val cfg = graft.streaming.StreamingCuration.Config(
      nPlanes = b, nTables = t, threshold = 0.95,
      evalVecs = evalVecs, evalShingles = evalShingles, model = model)

    // 4 id-range crawl files (one per future micro-batch)
    val baseMax = 1000000000000000L
    val mid = crawl.filter($"doc_id" < baseMax)
      .stat.approxQuantile("doc_id", Array(0.5), 0.01).head.toLong
    Seq($"doc_id" < mid,
      $"doc_id" >= mid && $"doc_id" < baseMax,
      $"doc_id" >= baseMax && $"doc_id" < 2 * baseMax,
      $"doc_id" >= 2 * baseMax).zipWithIndex.foreach { case (p, i) =>
      crawl.filter(p).coalesce(1).write.parquet(s"$tmp/crawl/f$i.parquet")
    }
    val files = new java.io.File(s"$tmp/crawl").listFiles().map(_.toString).sorted

    val t0 = System.nanoTime()
    val stream = spark.readStream.schema(crawl.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/crawl/*")
    val q = graft.streaming.StreamingCuration.run(stream, cfg,
      s"$tmp/store", s"$tmp/out", s"$tmp/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    val kept = spark.read.parquet(s"$tmp/out").count()
    val nBatches = spark.read.parquet(s"$tmp/out")
      .select($"batch_id").distinct().count()
    println(f"[streamcur] $dir total=$total kept=$kept batches=$nBatches " +
      f"wall=$wall%.1f s throughput=${total / wall}%.0f docs/s files=${files.length}")
    spark.stop()
  }
}
