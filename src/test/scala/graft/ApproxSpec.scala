package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Approximate-aggregate accuracy: the sketches must track their exact
  * counterparts closely at fixture scale (deterministic — Spark's HLL++
  * and quantile sketches are seed-free). The PRODUCTION shape is the
  * sketch-only aggregate (one pass, mergeable partials, no Expand
  * double-scan) — asserted here in isolation; the DECLARED q67 is the
  * error CONTRACT (exact values + tolerance booleans, DuckDB-oracled),
  * whose exact second scan is the correctness harness, not the hot path.
  */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def sketchOnly = {
    import spark.implicits._
    Tables.orders(spark, "/root/testdata/sf0.01")
      .groupBy($"o_orderstatus")
      .agg(
        approx_count_distinct($"o_custkey", 0.02).as("approx_custs"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50"),
        count(lit(1)).as("n"))
  }

  test("approx_count_distinct and approx_percentile stay within tolerance of exact") {
    import spark.implicits._
    val rows = sketchOnly.collect()
    assert(rows.nonEmpty)
    val exactCusts = Tables.orders(spark, "/root/testdata/sf0.01")
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("exact_custs"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_custs").toDouble
      val exact = exactCusts(r.getString(0)).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"HLL++ drifted: approx=$approx exact=$exact")
    }
    // approx_percentile with accuracy 1000 is exact-rank-close on 15k rows:
    // compare to the exact interpolated median bounds per group
    val exactP50 = SparkEntry.queries("q49_grouping_sets")(spark, "/root/testdata/sf0.01")
      .collect()
      .filter(r => !r.isNullAt(0)) // per-status rows
      .map(r => r.getString(0) -> r.getAs[Double]("med")).toMap
    rows.foreach { r =>
      val st = r.getString(0)
      val ap = r.getAs[Double]("approx_p50")
      exactP50.get(st).foreach { ex =>
        assert(math.abs(ap - ex) / ex <= 0.02, s"approx p50 drifted for $st: $ap vs $ex")
      }
    }
  }

  test("the sketch-only production plan is a single pass: no Expand") {
    val plan = sketchOnly.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"countDistinct Expand crept back in:\n$plan")
  }

  test("the declared q67 contract holds: both tolerance booleans TRUE per status") {
    val rows = SparkEntry.queries("q67_approx_aggs")(spark, "/root/testdata/sf0.01")
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("cd_ok") && r.getAs[Boolean]("p50_ok"),
        s"contract boolean FALSE for ${r.getString(0)}: $r")
    }
  }
}
