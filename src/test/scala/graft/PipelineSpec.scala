package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The composed north-star pipeline's stage invariants at fixture scale
  * (round-12 verdict item 4): each stage's removal is attributable to
  * the structure planted for it — exact copies to stage 1, near-dup
  * twins to stage 2, the benchmark slice + its text twins to stage 3 —
  * and the hand-off between stages is exact (rows_in of stage k+1 ==
  * rows_out of stage k).
  */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val run =
    graft.operators.CurationPipeline.runDetailed(spark, TestSpark.sfDir)
  private lazy val stages: Map[String, (Long, Long)] =
    run.stages.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private lazy val counts = {
    import spark.implicits._
    val docs = Tables.documents(spark, TestSpark.sfDir)
    val n = docs.count()
    val nCopies = docs.filter($"doc_id" % 7 === 0).count()
    val nTwins = docs.filter($"doc_id" % 4 === 0).count()
    val nVecTwins = Tables.embeddings(spark, TestSpark.sfDir)
      .filter($"vec_id" % 4 === 0).count()
    (n, nCopies, nTwins, nVecTwins)
  }

  test("stages chain exactly: rows_in(k+1) == rows_out(k)") {
    val order = Seq("1_exact_dedup", "2_neardup_dedup", "3_decontamination",
      "4_quality_filter", "5_packing_windows")
    order.sliding(2).foreach { case Seq(a, b) =>
      assert(stages(a)._2 == stages(b)._1, s"$a out != $b in: $stages")
    }
  }

  test("stage 1 removes exactly the planted exact copies") {
    val (n, nCopies, nTwins, _) = counts
    val (in1, out1) = stages("1_exact_dedup")
    assert(in1 == n + nCopies + nTwins, s"crawl size: $stages")
    assert(out1 == n + nTwins, s"exact dedup must drop the $nCopies copies " +
      s"and nothing else: $stages")
  }

  test("stage 2 removes the planted near-dup twins at >= the 0.99 recall target, precision 1") {
    val (_, _, _, nVecTwins) = counts
    val (in2, out2) = stages("2_neardup_dedup")
    val removed = in2 - out2
    // only twins WITH vectors are findable by the embedding chain; the
    // fixture corpus has no non-twin pairs at 0.95, so removals beyond
    // nVecTwins would be precision failures
    assert(removed <= nVecTwins, s"near-dup removed non-twins: $stages")
    assert(removed >= math.floor(0.99 * nVecTwins).toLong,
      s"near-dup recall under target ($removed of $nVecTwins): $stages")
  }

  test("stage 3 removes the benchmark slice and its contaminated neighbors — verified by the exact kernel") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val (in3, out3) = stages("3_decontamination")
    // the eval ids (< 200) present after stages 1-2 must all leave, plus
    // their surviving TEXT twins (2M+i for i < 200, i % 4 == 0, whose
    // vector twin the near-dup stage may already have removed)
    val nEvalBase = Tables.documents(spark, TestSpark.sfDir)
      .filter($"doc_id" < 200).count()
    assert(in3 - out3 >= nEvalBase, s"decontamination must at least remove " +
      s"the $nEvalBase benchmark docs: $stages")
    // no benchmark id survives
    assert(run.keepClean.filter($"doc_id" < 200).count() == 0,
      "benchmark ids survived decontamination")
    // the exact q136 kernel re-scores every SURVIVOR with a vector: none
    // may sit at cosine >= 0.9 to the eval matrix
    val (_, vecs) = graft.operators.CurationPipeline.plantedCrawl(spark, TestSpark.sfDir)
    val eval = vecs.filter($"vec_id" < 200)
      .select($"v").collect().map(_.getSeq[Double](0).toArray)
    val norms = eval.map(v => math.sqrt(v.map(x => x * x).sum))
    val contaminated = vecs
      .join(run.keepClean.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"), "left_semi")
      .select($"vec_id", graft.functions.MaxCosineExpr($"v", eval, norms).as("mc"))
      .filter($"mc" >= 0.9).count()
    assert(contaminated == 0,
      s"$contaminated surviving vectors sit at cosine >= 0.9 to the eval set")
  }

  test("stage 5 conserves tokens: windows sum to the survivors' token count") {
    val (in5, out5) = stages("5_packing_windows")
    assert(out5 > 0 && out5 <= in5 * 2, s"window count shape: $stages")
  }

  test("quality filter keeps a sane share (the weak-label corpus is mostly keepable)") {
    val (in4, out4) = stages("4_quality_filter")
    assert(out4 > in4 / 2, s"quality filter dropped most of the corpus: $stages")
    assert(out4 <= in4)
  }
}
