package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of q30 at a given SF. */
object ProfileQ30 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "profile-q30")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = Tables.documents(spark, d)
    time("scan")(docs.write.mode("overwrite").format("noop").save())
    val sh = docs.select($"doc_id", $"source", wordShingles($"text", 3).as("s"))
      .filter(size($"s") > 0)
    time("shingle")(sh.write.mode("overwrite").format("noop").save())
    val ex = sh.select($"source", $"doc_id", size($"s").as("sz"), explode($"s").as("shingle"))
    time("explode")(ex.write.mode("overwrite").format("noop").save())
    println("explode rows = " + time("explode count")(ex.count()))
    val exC = ex.cache(); exC.count()
    val a = exC.select($"source", $"doc_id".as("a_id"), $"sz".as("sza"), $"shingle")
    val b = exC.select($"source".as("src_b"), $"doc_id".as("b_id"), $"sz".as("szb"),
      $"shingle".as("sh_b"))
    val joined = a.join(b, $"source" === $"src_b" && $"shingle" === $"sh_b" && $"a_id" < $"b_id")
    println("join rows = " + time("join count (cached input)")(joined.count()))
    val agg = joined.groupBy($"source", $"a_id", $"b_id", $"sza", $"szb")
      .agg(count(lit(1)).as("common"))
    println("agg rows = " + time("agg (cached input)")(agg.count()))
    spark.stop()
  }
}
