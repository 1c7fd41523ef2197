package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BPE merge-table induction (north_star tokenizer work — the byte-pair
  * encoding merge loop of Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units"; the vocabulary-training
  * counterpart of the q75 pre-tokenizer): repeatedly find the most
  * frequent adjacent symbol pair across the corpus and fuse it.
  *
  * The 100 TB shape: the corpus is scanned ONCE into a word histogram
  * (vocabulary-sized — ~10⁷ rows however big the corpus, since the merge
  * loop only needs distinct words and their counts). Every iteration then
  * runs on that histogram alone: one explode over adjacent pairs + one
  * mergeable hash aggregate + a 1-row argmax collect (count desc, pair
  * lexicographic — deterministic), and a distributed map rewriting each
  * word's symbol sequence. Nothing per-iteration touches the corpus, and
  * per-iteration lineage is truncated with `localCheckpoint` so 50-merge
  * runs don't accrete a 50-deep plan.
  *
  * Words are split to characters with a trailing `</w>` end-of-word
  * symbol (the classic formulation), and merges apply greedily
  * left-to-right without overlap — `applyMerge("aaa", a+a)` yields
  * `[aa, a]`, matching the reference algorithm.
  */
object BpeTrain {

  /** Greedy non-overlapping left-to-right merge of adjacent (l, r). */
  def applyMerge(syms: IndexedSeq[String], l: String, r: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** One chosen merge. */
  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Train `nMerges` BPE merges on a (word, c) histogram.
    *
    * @param words DataFrame with a string `word` column and long `c` count
    * @return the ordered merge table
    */
  def train(spark: SparkSession, words: DataFrame, nMerges: Int): Seq[Merge] = {
    import spark.implicits._
    var vocab = words.select($"word", $"c")
      .as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString).toIndexedSeq :+ "</w>", c) }
      .toDF("syms", "c")
      .localCheckpoint(true)
    // truncate lineage every few merges, not every merge: between
    // checkpoints the upstream is ≤3 in-memory maps over the
    // vocabulary-sized frame, and skipping the per-iteration
    // materialization job roughly halves the loop's scheduling cost
    var lastCkpt = vocab
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var k = 1
    var done = false
    while (k <= nMerges && !done) {
      val top = vocab.as[(Seq[String], Long)]
        .flatMap { case (syms, c) =>
          syms.iterator.zip(syms.iterator.drop(1)).map { case (a, b) => (a, b, c) }
        }
        .toDF("l", "r", "c")
        .groupBy($"l", $"r").agg(sum($"c").as("cnt"))
        .orderBy($"cnt".desc, $"l", $"r")
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (top.isEmpty || top.head._3 < 2) done = true
      else {
        val (l, r, cnt) = top.head
        merges += Merge(k, l, r, cnt)
        var next = vocab.as[(Seq[String], Long)]
          .map { case (syms, c) => (applyMerge(syms.toIndexedSeq, l, r), c) }
          .toDF("syms", "c")
        if (k % 4 == 0) {
          next = next.localCheckpoint(true)
          lastCkpt.unpersist()
          lastCkpt = next
        }
        vocab = next
        k += 1
      }
    }
    lastCkpt.unpersist()
    merges.toSeq
  }

  /** Token count of one word under a trained merge table, applying the
    * merges in rank order (the BPE encode rule). */
  def encodeCount(word: String, merges: Seq[(String, String)]): Int = {
    var syms: IndexedSeq[String] = word.map(_.toString).toIndexedSeq :+ "</w>"
    merges.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
    syms.length
  }

  /** Train on a corpus text column: ONE corpus scan builds the word
    * histogram; the loop runs on the histogram only.
    */
  def trainOnCorpus(spark: SparkSession, docs: DataFrame, textCol: String,
                    nMerges: Int): DataFrame = {
    import spark.implicits._
    val words = docs
      .select(explode(expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("c"))
    val merges = train(spark, words, nMerges)
    merges.toDF()
      .select($"rank", $"left", $"right",
        concat($"left", $"right").as("merged"), $"pairCount".as("pair_count"))
  }
}
