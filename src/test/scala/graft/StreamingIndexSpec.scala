package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Search
import graft.streaming.StreamingIndex

/** Incremental BM25 index: stream ≡ batch ranking, upsert semantics,
  * replay idempotence, and compaction transparency (incl. the
  * crash-ordered swap via the shared compactOne discipline).
  */
class StreamingIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val allDocs = Seq(
    (1L, "apple banana apple cherry"),
    (2L, "apple banana"),
    (3L, "durian durian durian fig"),
    (4L, "cherry fig banana"),
    (5L, "apple fig fig durian"),
    (6L, "banana banana cherry durian fig"))
  private val queries = Seq(1 -> Seq("apple", "cherry"), 2 -> Seq("durian", "fig"))

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def searchRows(store: String) =
    StreamingIndex.searchBm25(spark, store, "doc_id", queries, 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  private def batchRows(rows: Seq[(Long, String)]) =
    Search.bm25TopK(spark, docsDf(rows), "doc_id", "text", queries, 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("three streamed batches rank identically to the batch operator; in-stream compaction changes nothing") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    // compactEvery = 2 → the replay-safe in-stream pass runs mid-stream,
    // so stream ≡ batch also certifies compaction transparency
    val q = StreamingIndex.run(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$tmp/idx", s"$tmp/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0),
      compactEvery = 2)
    try {
      allDocs.grouped(2).foreach { g => input.addData(g: _*); q.processAllAvailable() }
    } finally q.stop()
    assert(searchRows(s"$tmp/idx") === batchRows(allDocs))
    // the compacted store holds a batch_id=-1 partition
    assert(new java.io.File(s"$tmp/idx/batch_id=-1").exists())
    graft.streaming.StreamingCuration.deleteStore(tmp)
  }

  test("searchBm25 pushes the query-term IN filter to the postings scan; stats scan reads only (id, dl)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_pl").toString
    StreamingIndex.indexBatch(docsDf(allDocs), "doc_id", "text", s"$tmp/idx", 0L)
    // the scoring side is materialized (localCheckpoint) inside
    // searchBm25, so its scan is asserted on the frame it materializes
    val scoring = StreamingIndex.prunedPostings(spark, s"$tmp/idx",
      "doc_id", queries.flatMap(_._2).distinct)
      .queryExecution.executedPlan.toString
    assert("""PushedFilters: \[[^\]]*In\(term,""".r.findFirstIn(scoring).isDefined,
      "the query-term filter must reach the parquet scan for row-group pruning")
    val p = StreamingIndex.searchBm25(spark, s"$tmp/idx", "doc_id", queries, 10)
      .queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<doc_id:bigint,term:string,dl:bigint>"),
      "the corpus-stats pass must scan only (id, term, dl) — term solely for the tombstone mask")
    assert(!p.contains("tf:bigint"),
      "the stats pass must not read the tf column")
    graft.streaming.StreamingCuration.deleteStore(tmp)
  }

  test("upsert: a re-ingested doc_id scores with its newest text only") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_up").toString
    StreamingIndex.indexBatch(docsDf(allDocs), "doc_id", "text", s"$tmp/idx", 0L)
    // re-crawl doc 2: now about durian, no apple — query 1 must lose it,
    // query 2 must gain it, and the whole ranking must equal the batch
    // operator over the SUPERSEDED corpus
    val v2 = (2L, "durian durian fig fig")
    StreamingIndex.indexBatch(docsDf(Seq(v2)), "doc_id", "text", s"$tmp/idx", 1L)
    val expected = batchRows(allDocs.filterNot(_._1 == 2L) :+ v2)
    assert(searchRows(s"$tmp/idx") === expected)
    assert(!searchRows(s"$tmp/idx").exists(r => r._1 == 1 && r._3 == 2L))
    // compaction with version resolution keeps only the new rows
    StreamingIndex.compactIndex(spark, s"$tmp/idx", "doc_id")
    assert(searchRows(s"$tmp/idx") === expected)
    val terms2 = spark.read.parquet(s"$tmp/idx")
      .filter(col("doc_id") === 2L).select("term")
      .collect().map(_.getString(0)).toSet
    assert(terms2 === Set("durian", "fig"))
    graft.streaming.StreamingCuration.deleteStore(tmp)
  }

  test("replay idempotence: re-running a committed batch leaves the index unchanged") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_rp").toString
    val (b0, b1) = allDocs.splitAt(3)
    StreamingIndex.indexBatch(docsDf(b0), "doc_id", "text", s"$tmp/idx", 0L)
    StreamingIndex.indexBatch(docsDf(b1), "doc_id", "text", s"$tmp/idx", 1L)
    val before = searchRows(s"$tmp/idx")
    StreamingIndex.indexBatch(docsDf(b1), "doc_id", "text", s"$tmp/idx", 1L)
    assert(searchRows(s"$tmp/idx") === before)
    assert(before === batchRows(allDocs))
    graft.streaming.StreamingCuration.deleteStore(tmp)
  }

  test("changelog -D tombstones: masked immediately, physically erased at compaction, resurrectable") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_del").toString
    StreamingIndex.indexBatch(docsDf(allDocs), "doc_id", "text", s"$tmp/idx", 0L)
    // delete docs 3 and 5 (the durian-heavy ones) at batch 1
    StreamingIndex.deleteDocs(Seq(3L, 5L).toDF("doc_id"), "doc_id", s"$tmp/idx", 1L)
    val afterDelete = batchRows(allDocs.filterNot(r => r._1 == 3L || r._1 == 5L))
    assert(searchRows(s"$tmp/idx") === afterDelete,
      "a tombstoned doc must vanish from ranking AND corpus stats")
    // physically erased at compaction: no row for the ids remains
    StreamingIndex.compactIndex(spark, s"$tmp/idx", "doc_id")
    assert(searchRows(s"$tmp/idx") === afterDelete)
    val rawIds = spark.read.parquet(s"$tmp/idx")
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!rawIds.contains(3L) && !rawIds.contains(5L),
      "erasure must be physical after compaction, not just masked")
    // a later re-ingest of a deleted id wins by batch ordering
    StreamingIndex.indexBatch(docsDf(Seq((3L, "apple apple"))), "doc_id", "text", s"$tmp/idx", 2L)
    val resurrected = allDocs.filterNot(r => r._1 == 3L || r._1 == 5L) :+ ((3L, "apple apple"))
    assert(searchRows(s"$tmp/idx") === batchRows(resurrected))
    graft.streaming.StreamingCuration.deleteStore(tmp)
  }

  test("changelog batches: +U upserts, -U ignored, same-batch upsert beats -D") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_cl").toString
    StreamingIndex.indexChangelog(
      allDocs.map { case (id, tx) => ("+I", id, tx) }.toDF("row_kind", "doc_id", "text"),
      "doc_id", "text", s"$tmp/idx", 0L)
    val v2 = (2L, "durian durian fig fig")
    StreamingIndex.indexChangelog(Seq(
      ("-U", 2L, "apple banana"), ("+U", v2._1, v2._2),       // retract+update pair
      ("-D", 4L, null.asInstanceOf[String]),                  // plain delete
      ("-D", 6L, null.asInstanceOf[String]), ("+I", 6L, "cherry cherry") // net effect: upsert
    ).toDF("row_kind", "doc_id", "text"), "doc_id", "text", s"$tmp/idx", 1L)
    val expected = batchRows(
      allDocs.filterNot(r => Set(2L, 4L, 6L)(r._1)) :+ v2 :+ ((6L, "cherry cherry")))
    assert(searchRows(s"$tmp/idx") === expected)
    graft.streaming.StreamingCuration.deleteStore(tmp)
  }

  test("compaction crash between the swap renames recovers with no postings lost") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_sidx_cr").toString
    val store = s"$tmp/idx"
    StreamingIndex.indexBatch(docsDf(allDocs.take(4)), "doc_id", "text", store, 0L)
    StreamingIndex.indexBatch(docsDf(allDocs.drop(4)), "doc_id", "text", store, 1L)
    val before = searchRows(store)
    intercept[RuntimeException] {
      graft.streaming.StreamingCuration.compactOne(spark, store,
        Seq("term", "doc_id"), None, crashAt = 1,
        resolve = StreamingIndex.resolveLatest(_, "doc_id"))
    }
    // live tree is gone, aside survives — the next read must recover it
    assert(searchRows(store) === before)
    // and a rerun of the pass completes normally
    StreamingIndex.compactIndex(spark, store, "doc_id")
    assert(searchRows(store) === before)
    graft.streaming.StreamingCuration.deleteStore(tmp)
  }
}
