package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, leakage-free train/validation/test assignment — the
  * split step every training-data pipeline runs last. Assignment is a
  * pure function of (key, salt): stable across runs, engines, partition
  * layouts and cluster sizes, so a re-run never migrates a document
  * across splits (the classic eval-leak). Salting gives independent
  * re-splits without touching the data.
  *
  * Mechanism: the first two hex chars of `md5(key || ':' || salt)` form
  * a uniform bucket in [0, 256). Fixed-length lowercase hex compares
  * lexicographically exactly as it compares numerically, so the split
  * predicate is a plain string comparison — narrow, codegen'd, and
  * replayable verbatim by any engine with md5 (the DuckDB oracle
  * hash-verifies it).
  *
  * Leakage note: pass the DOCUMENT id for document-level splits, or a
  * coarser key (url domain, cluster representative from
  * [[graft.dedup.Dedup.duplicateClusters]]) to keep near-duplicate
  * families in one split — splitting finer than your dedup granularity
  * re-opens the leak dedup closed.
  */
object Splits {

  /** Bucket threshold as a two-hex-char string: pct of 256, clamped.
    * 256 (a 100% threshold) must sort ABOVE every 2-char hex bucket —
    * f"%02x" would render it "100", which sorts below "ff" ('1' < 'f')
    * and silently misassigned any 100%-boundary split — so it maps to
    * "g0" ('g' > 'f' beats all of "00".."ff"). */
  private def hexThreshold(pctTimes256: Int): String =
    if (pctTimes256 >= 256) "g0"
    else f"${math.max(0, pctTimes256)}%02x"

  /** Split label column for `key`: "train" | "val" | "test" with
    * approximately trainPct/valPct/(100-trainPct-valPct) proportions
    * (granularity 1/256 ≈ 0.4%). */
  def splitLabel(key: Column, salt: String,
      trainPct: Int = 90, valPct: Int = 5): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"invalid split percentages train=$trainPct val=$valPct")
    val b = substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 2)
    val tEnd = hexThreshold(math.round(256.0 * trainPct / 100).toInt)
    val vEnd = hexThreshold(math.round(256.0 * (trainPct + valPct) / 100).toInt)
    when(b < tEnd, "train").when(b < vEnd, "val").otherwise("test")
  }

  /** df plus a `split` column assigned by `keyCol`. */
  def assign(df: DataFrame, keyCol: String, salt: String,
      trainPct: Int = 90, valPct: Int = 5): DataFrame =
    df.withColumn("split", splitLabel(col(keyCol), salt, trainPct, valPct))

  /** Efraimidis–Spirakis exponential-race key for weighted sampling
    * WITHOUT replacement: e = −ln(u)/w, where the uniform u ∈ (0,1) is
    * derived deterministically from `md5(key || ':' || salt)` (first 12
    * hex chars → integer m, u = (m+0.5)/16¹²; the +0.5 keeps u strictly
    * inside (0,1), so ln never sees 0). Keeping the k SMALLEST keys
    * draws an exact-k sample where inclusion probability is
    * proportional-to-weight-without-replacement (Efraimidis & Spirakis
    * 2006, "Weighted random sampling with a reservoir") — the
    * quality-weighted subset selection step of a curation pipeline,
    * with the same determinism guarantees as [[splitLabel]]: a re-run,
    * a different partition layout, or a different engine draws the SAME
    * sample, and a new salt draws an independent one.
    *
    * Engine-replay note (gate p11): ln differs between engines in the
    * last ulp, so the key itself is never part of verified output —
    * only membership is, and the k-th/(k+1)-th key gap for any real
    * corpus is ~1/n relative, 10+ orders above ulp noise.
    *
    * @param weight must be strictly positive (w ≤ 0 corrupts the race:
    *               −ln(u)/0 → ±Inf and negative w inverts the order)
    */
  /** Deterministic uniform u ∈ (0,1), a pure function of (key, salt):
    * first 12 hex chars of md5 → integer m, u = (m+0.5)/16¹². Strictly
    * inside (0,1) so downstream ln/compares never see the endpoints;
    * exact in double (m < 2⁴⁸ and the divisor is 2⁴⁸). */
  def mdUniform(key: Column, salt: String): Column = {
    val m = conv(substring(md5(concat(key.cast("string"), lit(":" + salt))),
      1, 12), 16, 10).cast("long")
    (m.cast("double") + lit(0.5)) / lit(math.pow(16.0, 12))
  }

  def weightedSampleKey(key: Column, weight: Column, salt: String): Column = {
    // in-plan guard (mirrors the require() checks on k/alpha/budget): w <= 0
    // corrupts the race silently (+Inf key = never sampled; negative w
    // inverts the order so the WORST rows always win) — fail loudly instead
    val w = when(weight.isNull || weight <= lit(0),
      raise_error(concat(
        lit("weightedSampleKey: weight must be strictly positive, got "),
        coalesce(weight.cast("string"), lit("null"))))).otherwise(weight)
    -log(mdUniform(key, salt)) / w
  }

  /** Exact-k weighted sample of `df` (heavier rows proportionally more
    * likely), deterministic in (keyCol, salt). The plan is a narrow key
    * projection + `TakeOrderedAndProject`: each partition keeps its own
    * top-k candidates and the driver merges k rows — no global sort, no
    * full-corpus shuffle, O(k) driver state at any corpus size. Ties
    * (possible only via md5 collision) break on the key column. */
  def weightedSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, salt: String): DataFrame = {
    require(k >= 1, s"sample size k=$k must be >= 1")
    df.withColumn("__es_key", weightedSampleKey(col(keyCol), col(weightCol), salt))
      .orderBy(col("__es_key").asc, col(keyCol))
      .limit(k)
      .drop("__es_key")
  }

  /** Per-class weighted exact-k sampling — the stratified form of
    * [[weightedSample]]: an independent Efraimidis–Spirakis draw of k
    * rows INSIDE each class (per-language/per-source budgets, heavier
    * rows proportionally likelier within their class). Classes smaller
    * than k are kept whole.
    *
    * Plan at 100 TB: rank-over-window with a `<= k` filter compiles to
    * partial-below-the-shuffle `WindowGroupLimit` (like the p03 cap):
    * each map task forwards at most k rows per class it sees, so the
    * class exchange moves O(k · classes · tasks), never the corpus. */
  def weightedSamplePerClass(df: DataFrame, keyCol: String, classCol: String,
      weightCol: String, k: Int, salt: String): DataFrame = {
    require(k >= 1, s"sample size k=$k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(classCol))
      .orderBy(weightedSampleKey(col(keyCol), col(weightCol), salt).asc,
        col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k).drop("__rk")
  }

  /** Temperature-based class rebalancing — the multilingual upsampling
    * step of mT5/XLM-R (Xue et al. 2021 §3.1; Conneau et al. 2020 §3):
    * sample class l with probability ∝ n_l^α, α ∈ [0,1], so low-resource
    * classes (languages, domains, sources) are over-represented relative
    * to their corpus share without exploding any single class. α = 1
    * reproduces corpus proportions; α = 0 equalizes classes; the papers
    * use α ≈ 0.3–0.7.
    *
    * Mechanism: one small per-class count aggregate → per-class keep
    * rate min(1, budget·n_l^α / Σn^α / n_l), broadcast back; a row is
    * kept iff [[mdUniform]](key, salt) < rate(class). Selection is a
    * pure function of (key, salt, class counts): deterministic across
    * runs, engines and partition layouts, re-drawable by salt. E[output
    * size] = budget (exactly budget·p_l per class in expectation, capped
    * classes excepted).
    *
    * Plan at 100 TB: the count aggregate is map-side combined and
    * class-cardinality-sized; rates ride a broadcast join; the keep
    * predicate is narrow codegen. No corpus shuffle anywhere.
    *
    * @param budget target TOTAL sample size in rows (expectation)
    * @param alpha  temperature exponent in [0, 1]
    */
  def temperatureMix(df: DataFrame, keyCol: String, classCol: String,
      alpha: Double, budget: Long, salt: String): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha=$alpha outside [0,1]")
    require(budget >= 1, s"budget=$budget must be >= 1")
    val n = df.groupBy(col(classCol)).agg(count(lit(1)).cast("double").as("__n"))
    val w = n.withColumn("__w", pow(col("__n"), lit(alpha)))
    val tot = w.agg(sum(col("__w")).as("__tw"))
    val rates = w.crossJoin(broadcast(tot))
      .select(col(classCol),
        least(lit(1.0), lit(budget.toDouble) * col("__w") / col("__tw") / col("__n"))
          .as("__rate"))
    // null-safe equality: groupBy keeps NULL as its own class, but a plain
    // equi-join would never match it back, silently dropping every
    // null-class row (and with it E[output] below budget)
    val r = broadcast(rates.withColumnRenamed(classCol, "__tm_cls"))
    df.join(r, col(classCol) <=> col("__tm_cls"))
      .filter(mdUniform(col(keyCol), salt) < col("__rate"))
      .drop("__rate", "__tm_cls")
  }

  /** Weighted repeat-upsampling — materialize a per-class epoch-count
    * mix (the Llama/DoReMi-style "source X sees 2.5 epochs, source Y
    * 0.5" data recipe): every row of class l is emitted floor(w_l)
    * times, plus one extra copy iff [[mdUniform]](key, salt) < frac(w_l)
    * — so E[copies] = w_l exactly, per row, deterministically in
    * (key, salt). `copy_idx` (0-based) distinguishes the repeats so
    * downstream epoch reshuffle ([[shuffleOrder]] salted by copy_idx)
    * and packing never collapse them. Classes absent from `weights`
    * default to 1.0 (one epoch); w_l < 1 subsamples (rows may emit 0
    * copies and drop out).
    *
    * Plan at 100 TB: the weight lookup is a literal map, the copy count
    * and the fractional keep are narrow codegen, and the repeat is one
    * explode(sequence) — no shuffle anywhere; output size is the only
    * cost, which is the point of the operator.
    */
  def repeatUpsample(df: DataFrame, keyCol: String, classCol: String,
      weights: Map[String, Double], salt: String): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(w => w > 0 && w <= 100),
      s"weights must be in (0, 100]: $weights")
    val w = coalesce(element_at(typedlit(weights), col(classCol)), lit(1.0))
    val base = floor(w).cast("long")
    val extra = (mdUniform(col(keyCol), salt) < (w - floor(w))).cast("long")
    df.withColumn("__copies", base + extra)
      .filter(col("__copies") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Deterministic global training order: sort key = md5(key || salt).
    * A different salt per epoch gives independent reshuffles of the
    * whole corpus with zero RNG state — the reshuffle-per-epoch step
    * between [[assign]] and sequence packing. Engine-replayable like the
    * split (the p09 gate hash-verifies the order against DuckDB).
    * Sorting globally is one range exchange; at 100 TB feed this to
    * `repartitionByRange(...).sortWithinPartitions(...)` and let writers
    * emit ordered shards instead of asking for a single total order. */
  def shuffleOrder(key: Column, salt: String): Column =
    md5(concat(key.cast("string"), lit(":" + salt)))

  /** Budget allocation WITH BACKFILL across classes: each class gets its
    * weight-proportional share floor(B·w/W) capped at its supply, and
    * the leftover budget (from under-supplied classes and flooring) is
    * backfilled GREEDILY into remaining capacity in deterministic
    * priority order (largest proportional remainder, then class name).
    * The greedy sequence is expressed as ONE prefix-sum window over the
    * class-cardinality-sized summary — no iteration, all integer math,
    * replayable verbatim.
    *
    * Law: Σ alloc = min(budget, Σ supply); alloc_c ≤ supply_c; a class
    * with zero weight gets only backfill. This is the data-mixing step
    * after [[temperatureMix]]-style rate setting: rates give TARGETS,
    * backfill reconciles targets with what each source actually has.
    *
    * @param classes (class, supply, weight) one row per class; integer
    *   supply/weight columns
    * @return (class, supply, weight, base_alloc, backfill, alloc)
    */
  def budgetBackfill(classes: DataFrame, classCol: String,
      supplyCol: String, weightCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"budget=$budget must be >= 0")
    import org.apache.spark.sql.expressions.Window
    // loud in-plan guard (the weightedSampleKey discipline): a negative
    // supply or weight would silently invert shares/capacities
    def nonNeg(c: Column, what: String): Column =
      when(c.isNull || c < 0, raise_error(concat(
        lit(s"budgetBackfill: $what must be a non-negative integer, got "),
        c.cast("string")))).otherwise(c)
    val w = classes.select(col(classCol).as("cls"),
      nonNeg(col(supplyCol).cast("long"), supplyCol).as("supply"),
      nonNeg(col(weightCol).cast("long"), weightCol).as("weight"))
    val tot = w.agg(sum(col("weight")).as("tw")).select(
      when(col("tw") > 0, col("tw")).otherwise(lit(1L)).as("tw"))
    // exact integer share + remainder: floor(B·w/W), r = B·w mod W
    // `div` is integral division (truncation == floor for nonnegatives),
    // so shares/remainders are exact long arithmetic on every engine
    val shared = w.crossJoin(broadcast(tot))
      .withColumn("base_alloc",
        least(col("supply"), expr(s"($budget * weight) div tw")))
      .withColumn("rem", (lit(budget) * col("weight")) % col("tw"))
      .withColumn("cap", col("supply") - col("base_alloc"))
    val leftover = lit(budget) - sum(col("base_alloc")).over(Window.partitionBy())
    val order = Window.orderBy(col("rem").desc, col("cls"))
    shared
      .withColumn("cap_before",
        coalesce(sum(col("cap")).over(order.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("backfill",
        greatest(lit(0L), least(col("cap"), leftover - col("cap_before"))))
      .select(col("cls").as(classCol), col("supply"), col("weight"),
        col("base_alloc"), col("backfill"),
        (col("base_alloc") + col("backfill")).as("alloc"))
  }
}
