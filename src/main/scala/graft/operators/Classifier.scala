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

  /** Multinomial Naive Bayes text classifier, train + apply as ONE
    * declarative plan — the EXACT-arithmetic sibling of the logistic
    * [[fit]]/[[score]] pair (GD's float trajectory is contract-gated,
    * t13; NB's count tables make the whole model hash-verifiable,
    * t32). Laplace add-one smoothing over the joint vocabulary.
    *
    * Per-token log-likelihood ratios are quantized to integer PICO-NATS
    * before summation (the t21/t26 discipline: each `ln` term is
    * floor(ln(x)·1e12 + 0.5) — bit-agreed between engines — so the
    * per-document sum is integer arithmetic, order-independent, and any
    * SQL engine replays it exactly).
    *
    * Scale shape: the (token, class) count table and the ratio table
    * are VOCABULARY-sized (map-side combined aggregate); the class
    * totals are three broadcast scalars; apply is one explode + a
    * vocab-keyed join (broadcast at any corpus size) + one doc-keyed
    * integer-sum shuffle. The corpus text never shuffles.
    *
    * @param posLabel boolean column: the positive class (e.g. a
    *   wiki-vs-crawl weak label, `lang === "en"`, ...)
    * @return (idCol, score_pn BIGINT pico-nats of
    *   ln P(pos|doc) − ln P(neg|doc) up to the shared evidence term,
    *   pred = score_pn > 0)
    */
  def naiveBayesScores(df: DataFrame, idCol: String, textCol: String,
      posLabel: Column): DataFrame =
    naiveBayesScoresTracked(df, idCol, textCol, posLabel)._1

  /** [[naiveBayesScores]] plus the [[graft.dedup.Dedup.CacheHandle]]
    * releasing the persisted vocabulary table — invoke after the returned
    * frame's terminal action (the d09 discipline; the untracked overload
    * remains for harness callers that clearCache() between queries). */
  def naiveBayesScoresTracked(df: DataFrame, idCol: String, textCol: String,
      posLabel: Column): (DataFrame, graft.dedup.Dedup.CacheHandle) = {
    val pico = (x: Column) => floor(log(x) * lit(1e12) + lit(0.5)).cast("long")
    val toks = df.select(col(idCol), posLabel.as("pos"),
        explode(split(col(textCol), " ")).as("tok"))
      .filter(col("tok") =!= "")
    // persisted: the vocabulary table feeds the scalar rollup AND the
    // ratio projection — without it the corpus is exploded twice more.
    // Vocabulary-sized; released via the returned CacheHandle.
    val byClass = toks.groupBy(col("tok")).agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("cp"),
      sum(when(!col("pos"), 1L).otherwise(0L)).as("cn"))
      .persist()
    // three scalars: class token totals + joint vocabulary size
    // (null-safe: an all-empty corpus sums to NULL, not 0)
    val t = byClass.agg(sum(col("cp")), sum(col("cn")), count(lit(1))).head()
    val (tp, tn, v) =
      (if (t.isNullAt(0)) 0L else t.getLong(0),
        if (t.isNullAt(1)) 0L else t.getLong(1), t.getLong(2))
    val ratios = byClass.select(col("tok"),
      (pico((col("cp") + lit(1L)).cast("double") / lit((tp + v).toDouble)) -
        pico((col("cn") + lit(1L)).cast("double") / lit((tn + v).toDouble)))
        .as("r"))
    // class prior from DOC counts, same pico quantization (driver-side
    // Math.log is the identical IEEE double the in-plan log produces)
    val nd = df.select(posLabel.cast("int").as("p"))
      .agg(sum(col("p")), count(lit(1))).head()
    val (np, n) = (if (nd.isNullAt(0)) 0L else nd.getLong(0), nd.getLong(1))
    require(np > 0 && np < n, s"need both classes non-empty (pos=$np of $n)")
    val prior = math.floor(math.log(np.toDouble / n) * 1e12 + 0.5).toLong -
      math.floor(math.log((n - np).toDouble / n) * 1e12 + 0.5).toLong
    // vocabulary-sized ratio table rides a broadcast (without the hint,
    // Catalyst's estimate for an aggregate over the corpus can exceed
    // the threshold and shuffle the ENTIRE token stream on tok); the
    // per-doc rollup LEFT-joins back to the doc list so a zero-token
    // document still scores — the class prior — instead of silently
    // vanishing from the output
    val sums = toks.join(broadcast(ratios), "tok")
      .groupBy(col(idCol)).agg(sum(col("r")).as("rsum"))
    val out = df.select(col(idCol)).join(sums, Seq(idCol), "left_outer")
      .select(col(idCol),
        (coalesce(col("rsum"), lit(0L)) + lit(prior)).as("score_pn"))
      .select(col(idCol), col("score_pn"), (col("score_pn") > 0).as("pred"))
    (out, new graft.dedup.Dedup.CacheHandle(Seq(byClass)))
  }
}
