package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §7.4.7 "Skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join handles most cases by splitting oversized partitions at
  * runtime; explicit salting remains the tool when one key's rows must
  * not serialize through a single task downstream (e.g. a follow-up
  * window over the join output) or when AQE is unavailable (streaming).
  *
  * Mechanics: the left (large, skewed) side gets a deterministic salt in
  * [0, n) derived from a hash of its whole row; the right side is
  * replicated n× with every salt value. The join key becomes
  * (key, salt) — each hot key now spreads over n tasks. Right-side
  * amplification is n×, so keep the right side the smaller input and n
  * modest (8–32).
  */
object SkewJoin {

  /** Inner equi-join `left.key == right.key` with `n`-way salting.
    * Same-named keys (the common equi-join shape) are handled — sides
    * are disambiguated internally. The salt hashes the whole left row
    * PLUS a per-partition row index, so fully-duplicate rows of a hot
    * key still spread across the n salt buckets.
    */
  def salted(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      n: Int): DataFrame = {
    val leftCols = left.columns.toSeq
    // the salt value only selects WHICH replicated right copy a left row
    // joins, never whether it matches — so a retry-nondeterministic row
    // index is safe here and spreads duplicate rows
    val saltedLeft = left
      .withColumn("__salt",
        pmod(xxhash64(leftCols.map(col) :+ monotonically_increasing_id(): _*),
          lit(n.toLong)).cast("int"))
    val saltedRight = right.withColumn("__salt_r",
      explode(sequence(lit(0), lit(n - 1))))
    // alias the sides so identical key names never resolve ambiguously
    val l = saltedLeft.alias("__sl")
    val r = saltedRight.alias("__sr")
    l.join(r,
        col(s"__sl.`$leftKey`") === col(s"__sr.`$rightKey`") &&
          col("__sl.__salt") === col("__sr.__salt_r"))
      .drop("__salt", "__salt_r")
  }
}
