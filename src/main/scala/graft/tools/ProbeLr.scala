package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._
import graft.operators.QualityClassifier

/** Dev probe: quality-classifier convergence — loss trajectory +
  * train-set accuracy for a (dim, iters, lr) grid, used to pick q134's
  * pinned hyperparameters. Usage:
  *   runMain graft.tools.ProbeLr [sfDir] [dim] [iters] [lr]
  */
object ProbeLr {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val dim = if (args.length > 1) args(1).toInt else 64
    val iters = if (args.length > 2) args(2).toInt else 30
    val lr = if (args.length > 3) args(3).toDouble else 5.0
    val spark = GraftSession.local(8, "graft-probe-lr")
    import spark.implicits._
    val labeled = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text",
        tokenCount($"text").cast("long").as("n_tok"),
        langScore($"text", enMarkers).as("n_stop"),
        punctCount($"text").as("n_punct"),
        length($"text").as("len"))
      .withColumn("y",
        ($"n_tok" >= 5 && $"n_punct" / $"len" <= 0.1 && $"n_stop" > 0).cast("double"))
    val feats = QualityClassifier.featurize(labeled, "text", dim)
    val model = QualityClassifier.train(feats, "f", "y", dim, iters, lr)
    println(s"[probe-lr] dim=$dim iters=$iters lr=$lr")
    println("[probe-lr] losses: " + model.losses.map(l => f"$l%.4f").mkString(" "))
    val scored = feats.withColumn("score", QualityClassifier.score($"f", model))
      .withColumn("pred", ($"score" > 0.5).cast("double"))
    val row = scored.agg(
      avg(($"pred" === $"y").cast("double")).as("acc"),
      avg($"y").as("base"), min($"score"), max($"score")).head()
    println(f"[probe-lr] acc=${row.getDouble(0)}%.4f base=${row.getDouble(1)}%.4f " +
      f"score_range=[${row.getDouble(2)}%.3f, ${row.getDouble(3)}%.3f]")
    spark.stop()
  }
}
