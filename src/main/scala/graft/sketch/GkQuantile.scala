package graft.sketch

import scala.collection.mutable.ArrayBuffer

/** Greenwald–Khanna ε-approximate quantile summary (GK01, "Space-
  * Efficient Online Computation of Quantile Summaries") — the classic
  * mergeable quantile sketch: O((1/ε)·log(εN)) tuples, every quantile
  * query answered within ±εN RANK error, fully DETERMINISTIC (no RNG —
  * unlike KLL/reservoir approaches, two runs over the same stream give
  * the same summary, and the sk28 contract gate can assert the bound
  * exactly).
  *
  * The reference's streaming crate has no quantile sketch (its closest
  * shapes are Top/CountMin/HLL/Sample — amadeus-streaming/src/); this
  * extends the engine's sketch family to the remaining classic:
  * percentile monitoring over corpus-scale columns without a sort.
  *
  * State: sorted tuples (v, g, Δ) where g = rankMin(i) − rankMin(i−1)
  * and Δ = rankMax(i) − rankMin(i); the GK invariant g + Δ ≤ ⌊2εn⌋
  * bounds every query's rank uncertainty. Inserts buffer and flush in
  * sorted batches (the practical variant Spark/DataFu use); compress
  * merges adjacent tuples while the invariant allows.
  *
  * Merge concatenates the tuple lists in value order, summing worst-case
  * uncertainties — the merged summary answers within ε₁N₁ + ε₂N₂ ≤
  * ε(N₁+N₂) of rank when both sides share ε, the standard additive
  * bound; a final compress restores the space bound. Partial aggregation
  * trees therefore keep the ±εN guarantee at any partition count
  * (SketchSpec asserts the bound under random multi-way merges; the sk28
  * gate asserts it under Spark's real 32-partition partial-merge tree).
  *
  * NOT byte-exported: unlike HLL/theta/TopFreq registers, a GK summary
  * is a function of arrival order (compress decisions depend on when
  * the invariant binds), so shard bytes are not canonical; persist
  * quantile RESULTS, or the raw grid (GridHistogram) when a mergeable
  * exported state is required.
  */
final class GkQuantile(val eps: Double) extends Serializable {
  require(eps > 0.0 && eps < 0.5, s"eps=$eps outside (0, 0.5)")

  // (value, g, delta), sorted by value
  private[sketch] var samples: ArrayBuffer[(Double, Long, Long)] = ArrayBuffer.empty
  var count: Long = 0L
  private val bufCap: Int = math.max(8, (1.0 / (2.0 * eps)).toInt)
  private var buf: ArrayBuffer[Double] = ArrayBuffer.empty

  def add(v: Double): this.type = {
    require(!v.isNaN, "GkQuantile.add(NaN)")
    buf += v
    if (buf.length >= bufCap) flush()
    this
  }

  private def threshold(n: Long): Long = math.max(1L, (2.0 * eps * n).toLong)

  /** sorted-batch insert of the buffered values (one pass, in place) */
  private def flush(): Unit = {
    if (buf.isEmpty) return
    val sorted = buf.sortInPlace().toArray
    buf = ArrayBuffer.empty
    val out = ArrayBuffer.empty[(Double, Long, Long)]
    var i = 0 // over samples
    var j = 0 // over sorted batch
    while (i < samples.length || j < sorted.length) {
      if (j >= sorted.length || (i < samples.length && samples(i)._1 <= sorted(j))) {
        out += samples(i); i += 1
      } else {
        count += 1
        // new tuple: g = 1; Δ = ⌊2εn⌋ − 1 for interior inserts, 0 at the
        // extremes (GK batch-insert rule — the new value's rank is known
        // exactly relative to its neighbors at insert time only at the ends)
        val d =
          if (out.isEmpty || (i >= samples.length && j == sorted.length - 1)) 0L
          else math.max(0L, threshold(count) - 1L)
        out += ((sorted(j), 1L, d)); j += 1
      }
    }
    samples = out
    compress()
  }

  /** merge adjacent tuples while g_i + g_{i+1} + Δ_{i+1} ≤ ⌊2εn⌋ —
    * one right-to-left pass absorbing each tuple into its right
    * neighbor's cluster when the invariant allows; the minimum and
    * maximum samples always survive (exact extremes). */
  private def compress(): Unit = {
    if (samples.length < 3) return
    val thr = threshold(count)
    val out = ArrayBuffer.empty[(Double, Long, Long)]
    var acc = samples(samples.length - 1)
    var i = samples.length - 2
    while (i >= 1) {
      val cur = samples(i)
      if (cur._2 + acc._2 + acc._3 <= thr)
        acc = (acc._1, acc._2 + cur._2, acc._3)
      else { out += acc; acc = cur }
      i -= 1
    }
    out += acc
    out += samples(0)
    samples = ArrayBuffer.from(out.reverseIterator)
  }

  /** value whose rank is within ±εN of ⌈q·N⌉: the last sample whose
    * SUCCESSOR's max rank would overshoot the target's tolerance —
    * the standard GK query walk. */
  def query(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"q=$q outside [0,1]")
    flush()
    require(count > 0, "query on empty GkQuantile")
    val target = math.max(1L, math.ceil(q * count).toLong)
    // GK tolerance ⌊2εn⌋/2: the invariant caps every tuple's g+Δ at
    // ⌊2εn⌋, so half of it always admits an answer; in the exact regime
    // (thr = 1, all Δ = 0) this is 0 and the walk returns exact ranks
    val allowed = threshold(count) / 2
    var minRank = 0L
    var i = 0
    while (i < samples.length - 1) {
      minRank += samples(i)._2
      val nextMaxRank = minRank + samples(i + 1)._2 + samples(i + 1)._3
      if (nextMaxRank > target + allowed) return samples(i)._1
      i += 1
    }
    samples.last._1
  }

  /** size-summed union: value-ordered interleave of both tuple lists
    * with per-tuple DELTA ADJUSTMENT, then a compress against the
    * combined count.
    *
    * A tuple carried over unchanged would under-state its uncertainty:
    * up to g+Δ of the OTHER side's next tuple's elements hide between
    * it and its merged neighbor. The GK merge derivation (the
    * SPARK-21184 fix in Spark's own QuantileSummaries exists for
    * exactly this): a tuple from side A emitted with B's next tuple
    * (g_b, Δ_b) still ahead takes Δ' = Δ_a + g_b + Δ_b − 1 (0 extra at
    * the tail). The invariant is preserved — g_a + Δ' ≤ 2εN_a + 2εN_b
    * ≤ ⌊2εN⌋ up to floor slack — so queries stay within the ±εN walk
    * tolerance at any merge-tree shape (SketchSpec asserts the bound
    * under multi-way merges; the sk28 gate under Spark's real one). */
  def merge(o: GkQuantile): GkQuantile = {
    require(o.eps == eps, "GkQuantile eps mismatch")
    flush(); o.flush()
    // uniform no-alias semantics: the empty-side cases return a COPY, not
    // an operand — otherwise `a.merge(b)` aliases `a` or `b` exactly when
    // one side is empty, and a caller mutating the result silently mutates
    // the operand (fine inside the Aggregator, a footgun as a public API)
    if (o.count == 0) return copySketch()
    if (count == 0) return o.copySketch()
    val out = new GkQuantile(eps)
    out.count = count + o.count
    val merged = ArrayBuffer.empty[(Double, Long, Long)]
    var i = 0; var j = 0
    while (i < samples.length || j < o.samples.length) {
      val fromA = j >= o.samples.length ||
        (i < samples.length && samples(i)._1 <= o.samples(j)._1)
      if (fromA) {
        val (v, g, d) = samples(i); i += 1
        val extra =
          if (j < o.samples.length) o.samples(j)._2 + o.samples(j)._3 - 1 else 0L
        merged += ((v, g, d + math.max(0L, extra)))
      } else {
        val (v, g, d) = o.samples(j); j += 1
        val extra =
          if (i < samples.length) samples(i)._2 + samples(i)._3 - 1 else 0L
        merged += ((v, g, d + math.max(0L, extra)))
      }
    }
    out.samples = merged
    out.compress()
    out
  }

  /** independent copy of this summary (post-flush tuple state) */
  def copySketch(): GkQuantile = {
    flush()
    val out = new GkQuantile(eps)
    out.count = count
    out.samples = samples.clone()
    out
  }

  /** retained tuple count (space diagnostic) */
  def size: Int = { flush(); samples.length }
}
