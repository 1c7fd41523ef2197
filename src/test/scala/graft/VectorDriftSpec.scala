package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class VecEv(ts: Timestamp, source: String, embedding: Seq[Double])

/** Streaming embedding-drift monitor: stream ≡ batch fold, and a planted
  * orthogonal-encoder shard shows the mean-cosine drop.
  */
class VectorDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def v(ts: Long, src: String, e: Seq[Double]) =
    VecEv(new Timestamp(ts * 1000), src, e)

  test("centroid drift: streaming windowed stats equal batch; drifted shard drops") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // reference corpus: unit-ish vectors along e1 with small e3 noise
    val ref = Seq(Seq(1.0, 0.0, 0.05), Seq(0.98, 0.0, -0.02), Seq(1.02, 0.0, 0.01))
      .toDF("embedding")
    val centroid = graft.streaming.VectorDrift.referenceCentroid(ref, "embedding")
    assert(math.abs(centroid(0) - 1.0) < 0.01 && math.abs(centroid(1)) < 1e-9)

    val rows = Seq(
      v(5, "src_ok", Seq(0.9, 0.1, 0.0)), v(20, "src_ok", Seq(1.1, -0.1, 0.0)),
      v(10, "src_drift", Seq(0.0, 1.0, 0.0)), v(30, "src_drift", Seq(0.1, 0.9, 0.0)))

    val input = MemoryStream[VecEv]
    val q = graft.streaming.VectorDrift.centroidDrift(
      input.toDF().withWatermark("ts", "5 seconds"), centroid, "embedding", "1 minute")
      .writeStream.outputMode("append").format("memory").queryName("vdrift_out").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData(v(500, "src_ok", Seq(1.0, 0.0, 0.0))) // close the window
      q.processAllAvailable()
      val got = spark.table("vdrift_out")
        .filter($"wstart" === lit(new Timestamp(0)))
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_vecs"), r.getAs[Double]("mean_cos"), r.getAs[Double]("min_cos")))
        .toMap
      val batch = graft.streaming.VectorDrift.centroidDrift(
        rows.toDF(), centroid, "embedding", "1 minute")
        .collect().map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_vecs"), r.getAs[Double]("mean_cos"), r.getAs[Double]("min_cos")))
        .toMap
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got("src_ok")._2 > 0.9, s"aligned shard must stay high: $got")
      assert(got("src_drift")._2 < 0.2, s"drifted shard must drop: $got")
    } finally q.stop()
  }
}
