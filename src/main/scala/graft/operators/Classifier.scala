package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trainable quality classifier — the "train a linear model on weak
  * labels, score the corpus, keep the top" curation step (GPT-3's
  * WebText-vs-CommonCrawl logistic filter, CCNet's fastText variant),
  * re-expressed Spark-first.
  *
  * L2-regularized logistic regression, FULL-BATCH gradient descent:
  * each iteration is ONE distributed `treeAggregate` pass producing the
  * exact gradient (d+3 doubles of state per partial — gradient, bias
  * gradient, loss, count — independent of corpus size; the same
  * partial/merge shape as the sketches and PCA's Gram pass), followed
  * by a driver-side weight update. Deterministic:
  * no sampling, no row-order dependence (gradient terms are summed, and
  * FP addition order varies only within the merge tree — spec-verified
  * stable for the gate's data), fixed iteration count.
  *
  * Scoring is a NARROW codegen'd pass: native dot_product against the
  * literal weight vector + sigmoid — no model broadcast, no UDF.
  */
object Classifier {

  /** weights (d) + intercept, plus the training loss per iteration
    * (monotone non-increasing for a sane lr — spec-asserted). */
  final case class Model(weights: Array[Double], intercept: Double,
      losses: Array[Double]) {
    def d: Int = weights.length
  }

  private def sigmoid(z: Double): Double =
    if (z >= 0) 1.0 / (1.0 + math.exp(-z))
    else { val e = math.exp(z); e / (1.0 + e) }

  /** Fit on (features array<double>, label 0/1). `iters` exact-gradient
    * passes over the corpus. */
  def fit(df: DataFrame, featuresCol: String, labelCol: String,
      iters: Int = 50, lr: Double = 1.0, l2: Double = 1e-4): Model = {
    // persisted: every GD iteration re-reads this (d+1 doubles per doc,
    // NOT corpus-sized) — without the cache, 80 iterations re-run the
    // scan + feature extraction 80 times
    val rows = df.select(col(featuresCol), col(labelCol).cast("double"))
      .na.drop()
      .rdd.map(r => (r.getSeq[Double](0).toArray, r.getDouble(1)))
      .persist()
    val d = rows.first()._1.length
    var w = new Array[Double](d)
    var b = 0.0
    val losses = new Array[Double](iters)
    var it = 0
    while (it < iters) {
      val (wl, bl) = (w, b) // stable closure snapshot for the executors
      // partial: [Σ grad_w (d), Σ grad_b, Σ loss, n]
      val acc = rows.treeAggregate(new Array[Double](d + 3))(
        seqOp = (st, row) => {
          val (x, y) = row
          require(x.length == d, s"mixed feature dims: ${x.length} vs $d")
          var z = bl; var i = 0
          while (i < d) { z += wl(i) * x(i); i += 1 }
          val p = sigmoid(z)
          val g = p - y
          i = 0
          while (i < d) { st(i) += g * x(i); i += 1 }
          st(d) += g
          // numerically-stable log-loss: log(1+e^-|z|) + max(z,0) - z*y
          st(d + 1) += math.log1p(math.exp(-math.abs(z))) +
            math.max(z, 0.0) - z * y
          st(d + 2) += 1.0
          st
        },
        combOp = (a2, b2) => {
          var i = 0; while (i < a2.length) { a2(i) += b2(i); i += 1 }; a2
        })
      val n = acc(d + 2)
      require(n >= 1, "classifier needs at least one labeled row")
      val wNew = new Array[Double](d)
      var i = 0
      while (i < d) { wNew(i) = w(i) - lr * (acc(i) / n + l2 * w(i)); i += 1 }
      b -= lr * (acc(d) / n)
      losses(it) = acc(d + 1) / n + 0.5 * l2 * w.map(x => x * x).sum
      w = wNew
      it += 1
    }
    rows.unpersist(blocking = false)
    Model(w, b, losses)
  }

  /** P(label=1 | features): narrow, codegen'd — native dot product
    * against the literal weights, sigmoid in-plan. */
  def score(model: Model)(features: Column): Column = {
    val z = graft.plans.DotProductExpression.dot(features,
      typedlit(model.weights.toSeq)) + lit(model.intercept)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Standard text-quality feature vector over a text column (bounded,
    * unit-ish scales so one lr fits all): [tokens/100 capped at 2,
    * stopword ratio, punctuation ratio, avg word length / 10]. */
  def textFeatures(text: Column): Column = {
    import graft.functions.TextFunctions
    val toks = size(split(text, " ")).cast("double")
    array(
      least(toks / 100.0, lit(2.0)),
      TextFunctions.stopwordRatio(text),
      TextFunctions.punctRatio(text),
      least((length(text).cast("double") - toks + 1.0) / toks / 10.0, lit(2.0)))
  }
}
