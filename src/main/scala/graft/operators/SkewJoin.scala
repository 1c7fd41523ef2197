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

  /** Inner equi-join `left.key == right.key` with `n`-way salting. */
  def salted(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      n: Int): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col): _*), lit(n.toLong)).cast("int"))
    val saltedRight = right.withColumn("__salt_r",
      explode(sequence(lit(0), lit(n - 1))))
    saltedLeft.join(saltedRight,
        col(leftKey) === col(rightKey) && col("__salt") === col("__salt_r"))
      .drop("__salt", "__salt_r")
  }
}
