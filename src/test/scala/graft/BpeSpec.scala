package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain

/** BPE merge-table induction checked against an INDEPENDENT in-memory
  * reference implementation of the Sennrich et al. 2016 algorithm (plain
  * Scala maps, no Spark), plus unit checks of the greedy-merge contract.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Reference greedy non-overlapping merge, written recursively (a
    * different shape than the operator's while-loop on purpose). */
  private def refApply(syms: List[String], l: String, r: String): List[String] =
    syms match {
      case a :: b :: rest if a == l && b == r => (l + r) :: refApply(rest, l, r)
      case a :: rest                          => a :: refApply(rest, l, r)
      case Nil                                => Nil
    }

  /** Reference BPE trainer on a word histogram. */
  private def refTrain(words: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[List[String], Long] =
      words.groupMapReduce { case (w, _) => w.map(_.toString).toList :+ "</w>" }(_._2)(_ + _)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var k = 1
    var stop = false
    while (k <= n && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, c) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) += c)
      }
      if (counts.isEmpty || counts.values.max < 2) stop = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((k, l, r, c))
        vocab = vocab.groupMapReduce { case (syms, _) => refApply(syms, l, r) }(_._2)(_ + _)
        k += 1
      }
    }
    out.toSeq
  }

  test("applyMerge is greedy left-to-right without overlap") {
    assert(BpeTrain.applyMerge(Vector("a", "a", "a"), "a", "a") == Vector("aa", "a"))
    assert(BpeTrain.applyMerge(Vector("a", "a", "a", "a"), "a", "a") == Vector("aa", "aa"))
    assert(BpeTrain.applyMerge(Vector("x", "a", "b", "a", "b"), "a", "b") ==
      Vector("x", "ab", "ab"))
    assert(BpeTrain.applyMerge(Vector("ab", "c"), "a", "b") == Vector("ab", "c"))
    assert(BpeTrain.applyMerge(Vector.empty[String], "a", "b") == Vector.empty[String])
  }

  test("trainOnCorpus matches the in-memory reference on the sf0.001 fixture") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val words = docs
      .selectExpr("explode(regexp_extract_all(lower(text), '[a-z]+', 0)) AS word")
      .groupBy($"word").count()
      .as[(String, Long)].collect().toMap
    val expected = refTrain(words, 20)
    val got = BpeTrain.trainOnCorpus(spark, docs, "text", 20)
      .as[(Int, String, String, String, Long)]
      .collect().toSeq
      .map { case (k, l, r, _, c) => (k, l, r, c) }
    assert(got == expected)
  }

  test("encodeCount applies merges in rank order") {
    // merges: (a,b)->ab then (ab,</w>)->ab</w>
    val merges = Seq(("a", "b"), ("ab", "</w>"))
    assert(BpeTrain.encodeCount("ab", merges) == 1)      // [ab</w>]
    assert(BpeTrain.encodeCount("aab", merges) == 2)     // [a, ab</w>]
    assert(BpeTrain.encodeCount("ba", merges) == 3)      // [b, a, </w>]
    assert(BpeTrain.encodeCount("x", Seq.empty) == 2)    // [x, </w>]
  }

  test("merges stop when no pair repeats") {
    import spark.implicits._
    val words = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "c")
    val merges = BpeTrain.train(spark, words, 10)
    assert(merges.isEmpty)
  }
}
