package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Approximate-aggregate accuracy: the sketches must track their exact
  * counterparts closely at fixture scale (deterministic — Spark's HLL++
  * and quantile sketches are seed-free). The exact values are computed
  * HERE, in a separate scan, so the declared q67 stays sketch-only (no
  * Expand double-scan in its plan — see Relational3.q67_approx_aggs).
  */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("approx_count_distinct and approx_percentile stay within tolerance of exact") {
    import spark.implicits._
    val rows = SparkEntry.queries("q67_approx_aggs")(spark, "/root/testdata/sf0.01")
      .collect()
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

  test("q67 plan is a single pass: no Expand, hash-aggregate partials") {
    val plan = SparkEntry.queries("q67_approx_aggs")(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"countDistinct Expand crept back in:\n$plan")
  }
}
