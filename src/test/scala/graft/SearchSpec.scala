package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Search

/** Ranked-retrieval operators (BM25 / hybrid RRF): kernel values pinned
  * against a hand-computed mini-corpus, candidate sets and rank order
  * pinned against retrieval semantics.
  */
class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "apple banana apple cherry"),
      (2L, "apple banana"),
      (3L, "durian durian durian fig"),
      (4L, "cherry fig banana")
    ).toDF("doc_id", "text")
  }

  test("termFrequencies: tf and dl per (doc, term)") {
    val tf = Search.termFrequencies(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(2))).toMap
    assert(tf((1L, "apple")) === ((2L, 4L)))
    assert(tf((3L, "durian")) === ((3L, 4L)))
    assert(tf((4L, "fig")) === ((1L, 3L)))
    assert(!tf.contains((2L, "cherry")))
  }

  test("bm25TopK: candidate sets, rank order, and a hand-computed score") {
    val out = Search.bm25TopK(spark, corpus, "doc_id", "text",
      Seq(1 -> Seq("apple"), 2 -> Seq("durian", "fig")), 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // query 1 "apple": exactly docs 1 and 2 match; tf=2 outranks tf=1
    val q1 = out.filter(_._1 == 1).sortBy(_._2)
    assert(q1.map(_._3).toSeq === Seq(1L, 2L))
    // query 2: doc 3 (durian tf=3 + fig) outranks doc 4 (fig only)
    val q2 = out.filter(_._1 == 2).sortBy(_._2)
    assert(q2.map(_._3).toSeq === Seq(3L, 4L))
    // pin doc 3's score against the formula computed independently here
    val N = 4.0; val avgdl = (4 + 2 + 4 + 3) / 4.0
    def idf(df: Double) = math.log(1.0 + (N - df + 0.5) / (df + 0.5))
    def w(tf: Double, dl: Double, df: Double) =
      idf(df) * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val expected = BigDecimal(w(3, 4, 1) + w(1, 4, 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(q2.head._4 - expected) < 1e-9)
    // ranks are 1..n consecutive within each query
    assert(q1.map(_._2).toSeq === Seq(1L, 2L) && q2.map(_._2).toSeq === Seq(1L, 2L))
  }

  test("phraseSearch: exact sequences, overlapping matches, repeated-word phrases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),     // "a b" x3 (overlap-free pairs at 0,2,4)
      (2L, "a a a"),           // "a a" x2 (overlapping at 0,1); no "a b"
      (3L, "x a b y a b"),     // "a b" at 1 and 4
      (4L, "b a")              // reversed — no match
    ).toDF("doc_id", "text")
    val out = Search.phraseSearch(spark, docs, "doc_id", "text",
      Seq(1 -> Seq("a", "b"), 2 -> Seq("a", "a")))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out === Map(
      (1, 1L) -> ((3L, 0L)),   // "a b" at 0, 2, 4
      (1, 3L) -> ((2L, 1L)),   // "a b" at 1, 4
      (2, 2L) -> ((2L, 0L)))) // overlapping "a a" at 0 and 1; docs 1/4 absent
  }

  test("hybridRrf: fuses lexical and vector ranks, tolerates one-sided candidates") {
    import spark.implicits._
    // doc 2 is lexically close to doc 1 AND vector-close; doc 3 is
    // lexically disjoint from doc 1 but vector-close (vector-only
    // fusion); doc 4 has NO vector row (lexical-only fusion).
    val vecs = Seq(
      (1L, Array(1.0, 0.0, 0.1)),
      (2L, Array(0.9, 0.1, 0.1)),
      (3L, Array(0.8, 0.3, 0.0))
    ).toDF("vec_id", "v")
    val out = Search.hybridRrf(corpus, "doc_id", "text", vecs,
      corpus.filter(col("doc_id") === 1L), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.forall(_._1 == 1L) && !out.exists(_._3 == 1L))
    val byCand = out.map(r => r._3 -> (r._2, r._4)).toMap
    assert(byCand.keySet === Set(2L, 3L, 4L))
    // lexical ranks for "apple banana apple cherry": doc2 (apple+banana)
    // beats doc4 (banana+cherry, longer-irrelevant mix? both 2 terms —
    // scores decide); doc3 shares nothing lexically. Vector ranks: doc2
    // then doc3. Two-system doc2 must fuse highest.
    assert(byCand(2L)._1 === 1L)
    // doc2 = both systems at rank 1 and lexical rank 1 → 2/61
    val rrf2 = BigDecimal(1.0 / 61 + 1.0 / 61)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(byCand(2L)._2 - rrf2) < 1e-9)
    // one-sided candidates carry exactly one reciprocal term
    assert(byCand(3L)._2 === BigDecimal(1.0 / 62)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) // vector rank 2
    val lex4 = byCand(4L)._2
    assert(lex4 == BigDecimal(1.0 / 62).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }
}
