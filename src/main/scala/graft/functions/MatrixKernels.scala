package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Matrix-at-once vector kernels: one Expression evaluation per row
  * computes ALL plane/centroid dot products in a compiled loop, with the
  * matrix attached as a codegen reference object.
  *
  * Why: composing per-plane/per-centroid columns (`array(dot(v,p0),
  * dot(v,p1), …)`) inlines one generated dot loop PER PLANE into the
  * consume path — at 17 tables × 9 planes (the sf1-scale LSH setting) or
  * 256 centroids (auto-scaled IVF) the generated method blows past JIT
  * limits and the whole stage falls back to interpreted evaluation; the
  * sf1 probe measured 3× regressions from exactly this. A single kernel
  * call keeps codegen tiny and the arithmetic in one tight loop.
  *
  * Determinism contract: inner dot products use the same left-fold order
  * as [[DotProduct]] over min(len) elements, so signs/rankings are
  * bit-identical with the per-plane formulation and every golden-pinned
  * result is unchanged.
  */
object MatrixKernels {

  /** Per-table sign-LSH buckets: out(t) = Σ_j (v·planes(t)(j) > 0) << j. */
  def lshBuckets(v: ArrayData, planes: Array[Array[Array[Double]]]): ArrayData = {
    val out = new Array[Int](planes.length)
    val vn = v.numElements()
    var t = 0
    while (t < planes.length) {
      val fam = planes(t)
      var bucket = 0
      var j = 0
      while (j < fam.length) {
        val hp = fam(j)
        val n = math.min(vn, hp.length)
        var s = 0.0
        var i = 0
        while (i < n) { s += v.getDouble(i) * hp(i); i += 1 }
        if (s > 0) bucket |= 1 << j
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Indices of the k centroids with largest cos(v, c_j) — computed as
    * (v·c_j)/cnorms(j) (the per-row 1/|v| factor is constant across j and
    * cannot change the ranking). Tie-break: first index wins, matching
    * TopKIndicesKernel's strict-greater selection.
    */
  def centroidTopK(v: ArrayData, cents: Array[Array[Double]],
      cnorms: Array[Double], k: Int): ArrayData = {
    val m = cents.length
    val sims = new Array[Double](m)
    val vn = v.numElements()
    var j = 0
    while (j < m) {
      val c = cents(j)
      val n = math.min(vn, c.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += v.getDouble(i) * c(i); i += 1 }
      // a zero-norm centroid yields NaN, which fails every > comparison
      // below and would leave best = -1; rank it last instead
      val sim = s / cnorms(j)
      sims(j) = if (java.lang.Double.isNaN(sim)) Double.NegativeInfinity else sim
      j += 1
    }
    val kk = math.min(k, m)
    val picked = new Array[Int](kk)
    val used = new Array[Boolean](m)
    var r = 0
    while (r < kk) {
      var best = -1
      var bestV = Double.NegativeInfinity
      var i = 0
      while (i < m) {
        if (!used(i) && (best < 0 || sims(i) > bestV)) { bestV = sims(i); best = i }
        i += 1
      }
      used(best) = true
      picked(r) = best
      r += 1
    }
    new GenericArrayData(picked)
  }

  /** max_j cos(v, refs_j) — the decontamination kernel: one compiled
    * loop over a broadcast reference matrix per row, full cosine (both
    * norms), so the value itself is reportable, not just the argmax.
    * Zero-norm rows or refs contribute NaN → skipped; no refs → -1.
    */
  def maxCosine(v: ArrayData, refs: Array[Array[Double]],
      rnorms: Array[Double]): Double = {
    val vn = v.numElements()
    var vs = 0.0
    var i = 0
    while (i < vn) { val x = v.getDouble(i); vs += x * x; i += 1 }
    val vnorm = math.sqrt(vs)
    var best = -1.0
    var j = 0
    while (j < refs.length) {
      val c = refs(j)
      val n = math.min(vn, c.length)
      var s = 0.0
      i = 0
      while (i < n) { s += v.getDouble(i) * c(i); i += 1 }
      val sim = s / (vnorm * rnorms(j))
      if (!java.lang.Double.isNaN(sim) && sim > best) best = sim
      j += 1
    }
    best
  }
}

/** array<int> of per-table sign-LSH bucket ids for an array<double>
  * vector column; `planes(t)(j)(i)` = component i of plane j of table t.
  */
case class LshBucketsExpr(child: Expression, planes: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MatrixKernels.lshBuckets(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[][][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MatrixKernels.lshBuckets($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBucketsExpr {
  /** Buckets for tables seeded 0..nTables-1 with the standard seeded
    * hyperplane families (VectorFunctions.hyperplanes).
    */
  def apply(vec: Column, nPlanes: Int, dim: Int, nTables: Int): Column =
    seeded(vec, nPlanes, dim, Array.range(0, nTables))

  /** Buckets for an explicit seed list (one table per seed). */
  def seeded(vec: Column, nPlanes: Int, dim: Int, seeds: Array[Int]): Column = {
    val planes = seeds.map(s => VectorFunctions.hyperplanes(nPlanes, dim, s))
    GraftColumnBridge.column(
      LshBucketsExpr(GraftColumnBridge.expression(vec), planes))
  }
}

/** array<int> of the nProbe nearest centroid indices (by cosine) for an
  * array<double> vector column.
  */
case class CentroidTopKExpr(child: Expression, cents: Array[Array[Double]],
    cnorms: Array[Double], k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    MatrixKernels.centroidTopK(input.asInstanceOf[ArrayData], cents, cnorms, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    val nref = ctx.addReferenceObj("ivfNorms", cnorms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MatrixKernels.centroidTopK($c, $cref, $nref, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CentroidTopKExpr {
  def apply(vec: Column, cents: Array[Array[Double]], cnorms: Array[Double],
      k: Int): Column =
    GraftColumnBridge.column(
      CentroidTopKExpr(GraftColumnBridge.expression(vec), cents, cnorms, k))
}

/** Max cosine of an array<double> vector column against a broadcast
  * reference matrix — the eval-set decontamination shape: the reference
  * side (an eval/benchmark set) is small by nature, so it rides the
  * plan as a codegen reference object and the corpus side is ONE
  * narrow scan with no join at all.
  */
case class MaxCosineExpr(child: Expression, refs: Array[Array[Double]],
    rnorms: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    MatrixKernels.maxCosine(input.asInstanceOf[ArrayData], refs, rnorms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("decontamRefs", refs, "double[][]")
    val nref = ctx.addReferenceObj("decontamNorms", rnorms, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MatrixKernels.maxCosine($c, $cref, $nref);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxCosineExpr {
  def apply(vec: Column, refs: Array[Array[Double]], rnorms: Array[Double]): Column =
    GraftColumnBridge.column(
      MaxCosineExpr(GraftColumnBridge.expression(vec), refs, rnorms))
}
