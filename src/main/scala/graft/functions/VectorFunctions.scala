package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector kernels over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDFs.
  * Floats are widened to double before any arithmetic so results are
  * engine-order-deterministic (sequential left fold on both Spark and the
  * DuckDB oracle).
  */
object VectorFunctions {

  /** Cast array<float> → array<double>. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Dot product (sequential left fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Sum of squares. */
  def normSq(v: Column): Column =
    aggregate(v, lit(0.0), (acc, x) => acc + x * x)

  def l2Norm(v: Column): Column = sqrt(normSq(v))

  /** L2-normalize: divide every component by the vector's norm.
    *
    * NOTE (measured): Spark evaluates higher-order functions interpreted,
    * and the norm sub-expression embedded in the lambda re-evaluates per
    * element — ~0.7 ms/row at dim 64. For hot kernels prefer keeping raw
    * vectors + a scalar norm column and dividing the dot product
    * (`DotProduct(a,b)/(na*nb)`), which stays fully codegen'd.
    */
  def normalize(v: Column): Column = {
    val nrm = l2Norm(v)
    transform(v, x => x / nrm)
  }

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** splitmix64 finalizer — deterministic component hash. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-random hyperplanes for sign-LSH — reproducible
    * everywhere, no RNG state.
    */
  def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    hyperplanes(nPlanes, dim, 0)

  /** Seeded variant: independent hyperplane families per `seed`, for
    * multi-table LSH (OR-amplification of recall). Components are
    * splitmix64-hashed uniforms in (−1, 1) — NOT a low-dimensional
    * analytic sequence like sin(c+i), whose vectors all lie in the 2-D
    * span of (cos i, sin i) and therefore give correlated, recall-capped
    * tables.
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Int): Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)((j, i) =>
      mix(seed.toLong * 1000003L + j.toLong * 65537L + i).toDouble / 9.223372036854776e18)

  /** Sign-LSH bucket id (int in [0, 2^nPlanes)): bit j set iff v·hp(j) > 0.
    * The standard random-hyperplane LSH for cosine similarity: vectors with
    * high cosine land in the same bucket with high probability, so ANN
    * search shrinks from all-pairs to per-bucket pairs. Signs are invariant
    * to positive scaling, so raw (unnormalized) vectors bucket identically
    * to normalized ones — pass raw vectors and skip normalization. Uses the
    * codegen'd DotProduct kernel per plane.
    */
  def lshBucket(v: Column, nPlanes: Int, dim: Int): Column =
    lshBucket(v, nPlanes, dim, 0)

  /** Seeded variant (see [[hyperplanes]]). Backed by the matrix kernel
    * (one compiled loop over all planes) — bit-identical buckets to the
    * historical per-plane `when(dot > 0, …)` composition, which inlined
    * one generated dot loop per plane and stopped scaling past ~16 planes
    * (see MatrixKernels scaladoc).
    */
  def lshBucket(v: Column, nPlanes: Int, dim: Int, seed: Int): Column =
    element_at(LshBucketsExpr.seeded(v, nPlanes, dim, Array(seed)), 1)
}
