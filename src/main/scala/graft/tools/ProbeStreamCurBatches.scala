package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe: PER-BATCH walls of the incremental curation kernel — does
  * batch cost grow with store size? (The store-side join is the one
  * term that reads everything already published; if it dominates, the
  * store wants a bucketed layout.) Drives processBatch directly on the
  * 4 id-range splits with timers.
  * Usage: runMain graft.tools.ProbeStreamCurBatches [dir]
  */
object ProbeStreamCurBatches {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]").appName("graft-probe-streamcur-batches"),
      shufflePartitions = cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.functions.TextFunctions
    import graft.operators.{CurationPipeline, QualityClassifier, Similarity}
    val tmp = java.nio.file.Files.createTempDirectory("probe_scb").toString
    val (docs, vecs) = CurationPipeline.plantedCrawl(spark, dir)
    val crawl = docs
      .join(vecs.select($"vec_id".as("doc_id"), $"v"), Seq("doc_id"), "left")
      .select($"doc_id", $"text", $"source", $"v").localCheckpoint(true)
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
    val baseMax = 1000000000000000L
    val mid = crawl.filter($"doc_id" < baseMax).agg(max($"doc_id")).head().getLong(0) / 2
    val splits = Seq(
      ("base_lo", $"doc_id" < mid),
      ("base_hi", $"doc_id" >= mid && $"doc_id" < baseMax),
      ("copies", $"doc_id" >= baseMax && $"doc_id" < 2 * baseMax),
      ("twins", $"doc_id" >= 2 * baseMax))
    splits.zipWithIndex.foreach { case ((label, p), i) =>
      val batch = crawl.filter(p).localCheckpoint(true)
      val n = batch.count()
      val t0 = System.nanoTime()
      val kept = graft.streaming.StreamingCuration
        .processBatch(batch, cfg, s"$tmp/store", batchId = i.toLong).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[scb] $dir batch=$i($label) in=$n kept=$kept wall=$wall%.1f s")
    }
    spark.stop()
  }
}
