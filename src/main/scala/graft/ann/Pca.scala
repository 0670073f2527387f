package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality-reduction
  * step of an embedding pipeline (compress vectors before ANN indexing /
  * clustering, complementing [[Quantize]]'s per-element compression).
  *
  * Scale shape (the standard one for tall-skinny X):
  *  - ONE distributed pass accumulates n, Σv, and the d×d Gram matrix
  *    Σ v·vᵀ via `treeAggregate` (the partial/merge shape of the sketch
  *    aggregators; the shipped state is d² doubles — for d=1024 that's
  *    8 MB per partial, independent of corpus size);
  *  - the covariance eigendecomposition runs DRIVER-SIDE on the d×d
  *    matrix (cyclic Jacobi — exact for symmetric matrices, microseconds
  *    at embedding dims), the same bounded-driver-train pattern as
  *    [[Ann.sphericalKMeans]] and BPE;
  *  - projection is a NARROW codegen'd pass: k fused dot products
  *    against literal component vectors ([[graft.plans.DotProductExpression]])
  *    minus the precomputed mean offsets — no shuffle, no model broadcast.
  *
  * Determinism: Jacobi rotation order is fixed; each component's sign is
  * canonicalized (first component of largest magnitude made positive), so
  * fit is a pure function of the data.
  */
object Pca {

  /** mean, row-major components (k × d, orthonormal, by descending
    * eigenvalue), and their eigenvalues (component variances). */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
      variances: Array[Double]) {
    def k: Int = components.length
    def d: Int = mean.length
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric d×d matrix.
    * Returns (eigenvalues, eigenvectors as columns) unsorted. */
  private[graft] def jacobiEigen(aIn: Array[Array[Double]],
      sweeps: Int = 64, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > tol) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          off = math.max(off, math.abs(a(p)(q)))
          if (math.abs(a(p)(q)) > tol) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // sign(0) must be +1 here: theta = 0 (equal diagonal) is the
            // 45-degree rotation, not a no-op — math.signum(0) = 0 would
            // silently skip it and never converge on e.g. [[2,1],[1,2]]
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // silent non-convergence would hand back a diagonal that is NOT the
    // spectrum and components that are not principal axes — same loud
    // contract as duplicateClusters' convergence check
    require(off <= tol,
      s"jacobiEigen did not converge after $sweeps sweeps (off-diag $off); " +
        "raise sweeps for this matrix")
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  /** Fit a k-component model: one distributed Gram pass + driver eigen. */
  def fit(emb: DataFrame, vecCol: String, k: Int): Model = {
    val cleaned = emb.select(col(vecCol)).na.drop()
    // learn d from a LocalLimit(1) probe — the scan short-circuits after
    // one row, so the Gram pass below is the only full pass over the
    // data. (Persisting the corpus-sized vector RDD to share the two
    // jobs would be exactly the cache that dies first at 100 TB.)
    val d = cleaned.limit(1).head().getSeq[Float](0).length
    val vecs = cleaned.rdd.map(_.getSeq[Float](0).toArray)
    // partial state: [n, Σv (d), Σ v·vᵀ upper triangle (d(d+1)/2)]
    require(k >= 1 && k <= d, s"k=$k out of range for dim $d")
    val triLen = d * (d + 1) / 2
    def zero = new Array[Double](1 + d + triLen)
    val acc = vecs.treeAggregate(zero)(
      seqOp = (st, v) => {
        require(v.length == d, s"mixed embedding dims: ${v.length} vs $d")
        st(0) += 1.0
        var i = 0; var t = 1 + d
        while (i < d) {
          st(1 + i) += v(i)
          var j = i
          while (j < d) { st(t) += v(i).toDouble * v(j); j += 1; t += 1 }
          i += 1
        }
        st
      },
      combOp = (x, y) => { var i = 0; while (i < x.length) { x(i) += y(i); i += 1 }; x })
    val n = acc(0)
    require(n >= 2, "PCA needs at least 2 rows")
    val mean = Array.tabulate(d)(i => acc(1 + i) / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0; var t = 1 + d
    while (i < d) {
      var j = i
      while (j < d) {
        val c = acc(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(idx => -evals(idx)).take(k)
    val comps = order.map { idx =>
      val w = Array.tabulate(d)(r => evecs(r)(idx))
      // sign canonicalization: largest-magnitude entry positive
      val m = w.indices.maxBy(r => math.abs(w(r)))
      if (w(m) < 0) w.map(x => -x) else w
    }.toArray
    Model(mean, comps, order.map(evals(_)).toArray)
  }

  /** Projection column: array<double> of k coordinates in the component
    * basis — k fused native dot products against literal components,
    * centered by the precomputed m·w_j offsets. Narrow + codegen'd. */
  def project(model: Model)(vec: Column): Column = {
    val offs = model.components.map(w =>
      w.indices.map(i => w(i) * model.mean(i)).sum)
    array(model.components.zip(offs).map { case (w, off) =>
      graft.plans.DotProductExpression.dot(vec, typedlit(w.toSeq)) - lit(off)
    }: _*)
  }

  /** Squared reconstruction residual of `vec` under the model, computed
    * WITHOUT materializing the reconstruction: for an orthonormal basis,
    * ‖v − m‖² − Σ proj_j² (Pythagoras). Exact given exact projections. */
  def residual2(model: Model)(vec: Column, proj: Column): Column = {
    val mm = model.mean.map(x => x * x).sum
    val vm = graft.plans.DotProductExpression.dot(vec,
      typedlit(model.mean.toSeq))
    val vv = graft.plans.DotProductExpression.dot(vec, vec)
    val p2 = aggregate(proj, lit(0.0), (acc, x) => acc + x * x)
    vv - lit(2.0) * vm + lit(mm) - p2
  }
}
