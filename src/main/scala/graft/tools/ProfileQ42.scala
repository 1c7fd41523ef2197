package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.{DotProduct, VectorFunctions}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only: stage timings for the ANN top-k plan at sf0.1. */
object ProfileQ42 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "profile-q42")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = Tables.embeddings(spark, d)
    time("warmup")(emb.write.mode("overwrite").format("noop").save())
    val n0 = emb.select(col("vec_id").as("a_id"),
      VectorFunctions.normalize(VectorFunctions.toDouble(col("embedding"))).as("ua"))
    time("normalize")(n0.write.mode("overwrite").format("noop").save())
    val n = n0.cache()
    time("cache fill")(n.count())
    val withB = n.withColumn("bucket", VectorFunctions.lshBucket(col("ua"), 8, 64))
    time("buckets")(withB.write.mode("overwrite").format("noop").save())
    println("bucket sizes: " + withB.groupBy("bucket").count()
      .orderBy(desc("count")).limit(5).collect().mkString(", "))
    val b = withB.select(col("a_id").as("b_id"), col("ua").as("ub"), col("bucket").as("bucket_b"))
    val pairs = withB.join(b, col("bucket") === col("bucket_b") && col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("bucket"), col("b_id"), DotProduct(col("ua"), col("ub")).as("cos"))
    println("pairs = " + time("pairs count")(pairs.count()))
    val top = pairs.withColumn("rn", row_number().over(
      Window.partitionBy(col("a_id")).orderBy(col("cos").desc, col("b_id"))))
      .filter(col("rn") <= 3)
    time("topk")(top.write.mode("overwrite").format("noop").save())
    spark.stop()
  }
}
