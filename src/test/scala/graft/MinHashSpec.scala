package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the r15 MinHash hashing factorization: the seeded chain
  * `xxhash64(s, lit(i))` equals `SeededXxHashInt(xxhash64(s), i)`
  * bit-for-bit, so minHashSignatures' single-byte-hash rewrite cannot
  * move a signature (and therefore cannot move a band or a candidate).
  */
class MinHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SeededXxHashInt(xxhash64(s), i) == xxhash64(s, i) bit-for-bit") {
    val strs = Seq("", "a", "the quick brown fox", "zyx append",
      "Ünïcodé ßtring — 漢字", "a b c d e f g h", "0123456789" * 10)
    val df = strs.toDF("s")
    val seeds = Seq(0, 1, 7, 31, 63)
    val cols = seeds.flatMap { i =>
      Seq(xxhash64($"s", lit(i)).as(s"old_$i"),
        graft.functions.SeededXxHashInt(xxhash64($"s"), i).as(s"new_$i"))
    }
    df.select(cols: _*).collect().foreach { r =>
      seeds.zipWithIndex.foreach { case (i, k) =>
        assert(r.getLong(2 * k) == r.getLong(2 * k + 1),
          s"mismatch at seed $i")
      }
    }
  }

  test("minHashSignatures matches the pre-factorization formulation") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six seven eight")).toDF("id", "text")
    val sigs = graft.operators.Dedup
      .minHashSignatures(docs, "id", "text", numHashes = 8)
      .as[(Long, Seq[Long])].collect().toMap
    // independent reference: explicit xxhash64(shingle, i) mins
    val sh = graft.functions.TextFunctions
      .explodedWordShingles(docs, Seq("id"), "text", 3, distinctShingles = false)
    val ref = sh.groupBy($"id")
      .agg(array((0 until 8).map(i => min(xxhash64($"shingle", lit(i)))): _*).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs == ref)
  }
}
