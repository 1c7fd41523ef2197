package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import scala.concurrent.Future
import scala.concurrent.duration._
import graft.operators.{AsyncIO, Changelog, Multimodal, SideOutput}

/** The thin custom patterns: async I/O, CDC changelog decode, side
  * outputs, multimodal column convention.
  */
class PatternsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("async mapOrdered preserves order; capacity bounds in-flight work") {
    import spark.implicits._
    val ds = (1 to 100).toDS().repartition(4)
    val out = AsyncIO.mapOrdered(ds, capacity = 8, timeout = 10.seconds) { (i, ec) =>
      Future { Thread.sleep((i % 3).toLong); i * 2 }(ec)
    }.collect()
    // order preserved within each partition → global set and per-partition
    // monotonicity; set equality is the portable assertion
    assert(out.toSet == (1 to 100).map(_ * 2).toSet)
    assert(out.length == 100)
  }

  test("async mapUnordered completes all items") {
    import spark.implicits._
    val ds = (1 to 50).toDS().repartition(2)
    val out = AsyncIO.mapUnordered(ds, capacity = 4, timeout = 10.seconds) { (i, ec) =>
      Future(i + 1000)(ec)
    }.collect()
    assert(out.toSet == (1 to 50).map(_ + 1000).toSet)
  }

  test("debezium json decodes to row_kind changelog; updates expand to -U/+U") {
    import spark.implicits._
    val df = Seq(
      """{"before": null, "after": {"id": 1, "v": 10.0}, "op": "c"}""",
      """{"before": {"id": 1, "v": 10.0}, "after": {"id": 1, "v": 20.0}, "op": "u"}""",
      """{"before": {"id": 2, "v": 5.0}, "after": null, "op": "d"}""")
      .toDF("json")
    val out = Changelog.fromDebeziumJson(df, "json", "id BIGINT, v DOUBLE")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == Set(
      ("+I", 1L, 10.0), ("-U", 1L, 10.0), ("+U", 1L, 20.0), ("-D", 2L, 5.0)))
  }

  test("changelog materialize applies the log: last version per key, deletes drop") {
    import spark.implicits._
    val log = Seq(
      ("+I", 1L, 10.0, 1L), ("-U", 1L, 10.0, 2L), ("+U", 1L, 20.0, 3L),
      ("+I", 2L, 5.0, 4L), ("-D", 2L, 5.0, 5L),
      ("+I", 3L, 7.0, 6L))
      .toDF("row_kind", "id", "v", "seq")
    val cur = Changelog.materialize(log, Seq("id"), "seq")
      .select("id", "v").collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(cur == Set((1L, 20.0), (3L, 7.0)))
  }

  test("side output splits rows exactly; late-data split honors watermark") {
    val events = Tables.events(spark, TestSpark.sfDir)
    val wm = lit("2024-01-15 00:00:00").cast("timestamp")
    val (onTime, late) = SideOutput.lateData(events, "ts", wm)
    val n = events.count()
    assert(onTime.count() + late.count() == n)
    assert(late.filter(col("ts") >= wm).count() == 0)
    assert(onTime.filter(col("ts") < wm).count() == 0)
  }

  test("multimodal convention: meta struct + stub decode + chunk sampling") {
    import spark.implicits._
    val df = Seq((1L, "fake-image-bytes-aaaa"), (2L, "fake-image-bytes-bbbb-longer"))
      .toDF("id", "s")
      .select($"id", $"s".cast("binary").as("content"))
    val withMeta = Multimodal.fakeDecode(
      Multimodal.attachMeta(df, "content", "image", "png"), "content")
    val rows = withMeta.select($"id", $"meta.modality", $"meta.n_bytes",
      $"meta.width", $"meta.height", $"meta.sha1").collect()
    rows.foreach { r =>
      assert(r.getString(1) == "image")
      assert(r.getLong(2) > 0)
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 1920)
      assert(r.getInt(4) >= 1 && r.getInt(4) <= 1080)
      assert(r.getString(5).length == 40)
    }
    // deterministic: same payload → same fake dimensions
    val again = Multimodal.fakeDecode(
      Multimodal.attachMeta(df, "content", "image", "png"), "content")
      .select($"id", $"meta.width").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val first = rows.map(r => (r.getLong(0), r.getInt(3))).toMap
    assert(again == first)
    val chunks = Multimodal.sampleChunks(df, "content", 4)
    assert(chunks.count() == 8)
    assert(chunks.groupBy("id").count().collect().forall(_.getLong(1) == 4))
  }

  test("embedding stub: fixed dim, deterministic, values in [-1,1]") {
    import spark.implicits._
    val df = Seq((1L, "payload-a"), (2L, "payload-b")).toDF("id", "s")
      .select($"id", $"s".cast("binary").as("content"))
    val out = df.select($"id", Multimodal.fakeEmbed($"content", 16).as("emb"))
      .collect().map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Double]]("emb")).toMap
    assert(out(1L).length == 16)
    assert(out(1L) != out(2L))
    out.values.flatten.foreach(v => assert(v >= -1.0 && v <= 1.0))
  }
}
