package graft.functions

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration for graft's native expressions — the analog of the
  * reference's `CREATE TEMPORARY FUNCTION` / built-in operator table
  * ([U] flink-table-planner FlinkSqlOperatorTable.java): after
  * `GraftFunctions.register(spark)` (or with
  * `spark.sql.extensions=graft.GraftExtensions` at session build), every
  * kernel is callable from `spark.sql` text alongside the built-ins.
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  /** (name, builder) for every SQL-exposed kernel, plus the Flink-named
    * dialect functions ([[FlinkFunctions]]).
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = FlinkFunctions.builders ++ Seq(
    "graft_dot" -> (exprs => DotProduct(exprs(0), exprs(1))),
    "graft_winnow" -> (exprs => WinnowFingerprints(exprs(0),
      if (exprs.length > 1) intArg(exprs(1), "k") else 8,
      if (exprs.length > 2) intArg(exprs(2), "w") else 4)),
    "graft_byte_histogram" -> (exprs => ByteHistogram(exprs(0),
      if (exprs.length > 1) intArg(exprs(1), "bins") else 64)),
    "graft_image_header" -> (exprs => ImageHeader(exprs(0))),
    "graft_wav_header" -> (exprs => WavHeader(exprs(0))),
    "graft_wav_stats" -> (exprs => WavStats(exprs(0))),
    "graft_mp4_header" -> (exprs => Mp4Header(exprs(0))),
    "graft_topk_indices" -> (exprs => TopKIndices(exprs(0), intArg(exprs(1), "k"))),
    "graft_shingles" -> (exprs => WordShinglesExpr(exprs(0),
      if (exprs.length > 1) intArg(exprs(1), "n") else 3,
      distinct = true)),
  )

  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, b) =>
      GraftColumnBridge.registerFunction(spark, name, b)
    }
    // Flink's COLLECT aggregate (MULTISET<T> as map<value, count> — the
    // MultisetAgg convention) — a udaf, so it registers via the UDF
    // registry rather than a Catalyst builder; once per session
    if (!spark.catalog.functionExists("collect"))
      spark.udf.register("collect",
        org.apache.spark.sql.functions.udaf(MultisetAgg.agg))
  }
}
