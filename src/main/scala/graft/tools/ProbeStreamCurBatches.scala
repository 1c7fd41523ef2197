package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe: PER-BATCH walls of the incremental curation kernel — does
  * batch cost grow with store size? (The store-side join is the one
  * term that reads everything already published; if it dominates, the
  * store wants a bucketed layout.) Drives processBatch directly on the
  * 4 id-range splits with timers. With nBatches > 4 the crawl is sliced
  * into that many equal id-ordered ranges instead (the many-small-files
  * regime); compactEvery = k > 0 runs compactStores after every k-th
  * batch, so a with/without pair measures what compaction buys.
  * Usage: runMain graft.tools.ProbeStreamCurBatches [dir] [nBatches] [compactEvery]
  */
object ProbeStreamCurBatches {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nBatches = if (args.length > 1) args(1).toInt else 4
    val compactEvery = if (args.length > 2) args(2).toInt else 0
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
    val splits: Seq[(String, org.apache.spark.sql.Column)] =
      if (nBatches <= 4) {
        val baseMax = 1000000000000000L
        val mid = crawl.filter($"doc_id" < baseMax).agg(max($"doc_id")).head().getLong(0) / 2
        Seq(
          ("base_lo", $"doc_id" < mid),
          ("base_hi", $"doc_id" >= mid && $"doc_id" < baseMax),
          ("copies", $"doc_id" >= baseMax && $"doc_id" < 2 * baseMax),
          ("twins", $"doc_id" >= 2 * baseMax))
      } else {
        // equal id-ordered ranges — the many-small-files regime.
        // DISTINCT boundary ids, batch count clamped to their number:
        // more batches than ids (or duplicate boundaries) would index
        // past the array / overlap adjacent slices
        val ids = crawl.select($"doc_id").orderBy($"doc_id")
          .distinct().as[Long].collect().sorted
        val n = math.min(nBatches, ids.length)
        val step = math.max(1, ids.length / n)
        (0 until n).map { i =>
          val lo = ids(math.min(ids.length - 1, i * step))
          val hiC = if (i == n - 1) lit(true)
            else $"doc_id" < ids(math.min(ids.length - 1, (i + 1) * step))
          (s"slice$i", $"doc_id" >= lo && hiC)
        }
      }
    def storeFiles: Long = {
      val root = java.nio.file.Paths.get(s"$tmp/store")
      if (!java.nio.file.Files.exists(root)) 0L
      else {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala
          .count(f => f.toString.endsWith(".parquet"))
      }
    }
    splits.zipWithIndex.foreach { case ((label, p), i) =>
      val batch = crawl.filter(p).localCheckpoint(true)
      val n = batch.count()
      val nf = storeFiles
      val t0 = System.nanoTime()
      val kept = graft.streaming.StreamingCuration
        .processBatch(batch, cfg, s"$tmp/store", batchId = i.toLong).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[scb] $dir batch=$i($label) in=$n kept=$kept files=$nf wall=$wall%.1f s")
      if (compactEvery > 0 && (i + 1) % compactEvery == 0 && i + 1 < splits.size) {
        val c0 = System.nanoTime()
        graft.streaming.StreamingCuration.compactStores(spark, s"$tmp/store")
        println(f"[scb] compacted after batch $i: files=$storeFiles " +
          f"wall=${(System.nanoTime() - c0) / 1e9}%.1f s")
      }
    }
    graft.streaming.StreamingCuration.deleteStore(tmp)
    spark.stop()
  }
}
