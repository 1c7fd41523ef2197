package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.Text

/** Document-frequency cap on the n-gram Jaccard inverted index: the
  * skew guard that bounds per-shingle join fan-out at τ² for corpus-scale
  * stop-phrase shingles.
  */
class DFCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = TestSpark.sfDir

  private def pairs(maxDocFreq: Option[Long]): Map[(String, Long, Long), Double] =
    Text.ngramJaccard(maxDocFreq)(spark, d).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("a_id"),
        r.getAs[Long]("b_id")) -> r.getAs[Double]("jaccard"))
      .toMap

  test("a cap above every DF is a no-op; tighter caps only shrink the estimate") {
    val exact = pairs(None)
    assert(exact.nonEmpty)
    // τ larger than the corpus doc count can never drop an index entry
    assert(pairs(Some(1000000L)) == exact)
    // a tight cap yields a subset of pairs with Jaccard ≤ the exact value
    // (dropped shingles can only remove intersection evidence)
    val capped = pairs(Some(3L))
    assert(capped.size <= exact.size)
    capped.foreach { case (k, j) =>
      assert(exact.contains(k) && j <= exact(k) + 1e-9, s"pair $k grew under the cap")
    }
    // τ=1 removes every shared shingle → no pairs survive
    assert(pairs(Some(1L)).isEmpty)
  }
}
