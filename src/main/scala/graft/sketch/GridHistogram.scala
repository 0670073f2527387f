package graft.sketch

/** Fixed-grid histogram quantile sketch — mergeable quantiles with a
  * DETERMINISTIC worst-case error bound of one bucket width.
  *
  * Complements the engine's `approx_percentile` (sk09/sk13, a
  * Greenwald–Khanna variant whose estimates are engine-internal): bucket
  * counts are EXACT integers and the bucket function is plain IEEE
  * arithmetic, so the whole sketch — counts, cumulative ranks, and the
  * interpolated quantile — replays bit-for-bit in any engine (the sk19
  * gate hash-verifies against a relational DuckDB replay; no other
  * quantile sketch family here has that property).
  *
  * Trade-off vs GK/KLL: the value range [lo, hi) must be chosen up
  * front, and the error is ABSOLUTE (≤ (hi−lo)/buckets) rather than
  * rank-relative. For monetary/size columns with known bounds that is
  * usually the better contract. Out-of-range values are counted in
  * `under`/`over`, NaN in `nan` (never silently dropped or bucketed) —
  * any of them fails `quantile` loudly.
  *
  * State is `buckets` longs regardless of stream size; merge is
  * element-wise addition — exact, commutative, associative. Safe as a
  * partial-agg buffer at any scale.
  */
final class GridHistogram(val lo: Double, val hi: Double, val buckets: Int)
    extends Serializable {
  require(buckets >= 1, s"buckets=$buckets must be >= 1")
  require(lo < hi, s"empty grid [$lo, $hi)")

  val counts = new Array[Long](buckets)
  var under: Long = 0L
  var over: Long = 0L
  var nan: Long = 0L

  /** Bucket width — also the worst-case quantile error. */
  def width: Double = (hi - lo) / buckets

  def add(v: Double): this.type = {
    // NaN fails BOTH range checks and floor(NaN).toInt == 0 — without an
    // explicit branch it would silently land in bucket 0 and skew every
    // quantile. Count it like the other out-of-grid cases so quantile()
    // fails loudly instead.
    if (java.lang.Double.isNaN(v)) nan += 1
    else if (v < lo) under += 1
    else if (v >= hi) over += 1
    else {
      // identical IEEE expression to the oracle replay:
      // floor((v - lo) / (hi - lo) * buckets)
      val i = math.floor((v - lo) / (hi - lo) * buckets).toInt
      // guard the hi-adjacent ulp case where rounding lands on `buckets`
      counts(if (i >= buckets) buckets - 1 else i) += 1
    }
    this
  }

  def total: Long = { var s = under + over + nan; var i = 0
    while (i < buckets) { s += counts(i); i += 1 }; s }

  def inRange: Long = total - under - over - nan

  /** Element-wise merge — exact. */
  def merge(o: GridHistogram): GridHistogram = {
    require(o.lo == lo && o.hi == hi && o.buckets == buckets,
      s"grid mismatch: [$lo,$hi)x$buckets vs [${o.lo},${o.hi})x${o.buckets}")
    val out = new GridHistogram(lo, hi, buckets)
    var i = 0
    while (i < buckets) { out.counts(i) = counts(i) + o.counts(i); i += 1 }
    out.under = under + o.under; out.over = over + o.over
    out.nan = nan + o.nan
    out
  }

  /** Interpolated quantile estimate, error ≤ [[width]]:
    * rank r = ceil(q·n); first bucket with cum ≥ r; linear interpolation
    * by remaining rank inside it. Throws if any value fell outside the
    * grid — an out-of-range estimate would silently violate the bound. */
  def quantile(q: Double): Double = {
    require(q > 0.0 && q <= 1.0, s"q=$q outside (0,1]")
    require(under == 0 && over == 0 && nan == 0,
      s"quantile undefined with out-of-grid values (under=$under over=$over nan=$nan)")
    val n = inRange
    require(n > 0, "quantile of an empty sketch")
    val r = math.ceil(q * n)
    var cum = 0L
    var i = 0
    while (i < buckets) {
      val c = counts(i)
      if (c > 0 && cum + c >= r)
        return lo + width * i + width * (r - cum) / c
      cum += c
      i += 1
    }
    hi // unreachable for valid q; keeps the compiler total
  }

  /** Versioned, byte-stable export: `[version=1, lo (8B BE IEEE bits),
    * hi (8B), buckets (4B BE), under (8B), over (8B), nan (8B),
    * buckets counts (8B BE each)]` — engine-neutral like
    * [[HyperLogLog.toBytes]]; the sk23 gate rebuilds the identical byte
    * string from an exact relational bucket census and matches its
    * fingerprint. */
  def toBytes: Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(1 + 8 + 8 + 4 + 8 * 3 + 8 * buckets)
    buf.put(1.toByte)
      .putLong(java.lang.Double.doubleToLongBits(lo))
      .putLong(java.lang.Double.doubleToLongBits(hi))
      .putInt(buckets).putLong(under).putLong(over).putLong(nan)
    var i = 0
    while (i < buckets) { buf.putLong(counts(i)); i += 1 }
    buf.array()
  }

  override def equals(other: Any): Boolean = other match {
    case o: GridHistogram => o.lo == lo && o.hi == hi && o.buckets == buckets &&
      o.under == under && o.over == over && o.nan == nan &&
      java.util.Arrays.equals(o.counts, counts)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(counts)
}

object GridHistogram {

  /** Parse a [[GridHistogram.toBytes]] export — loud validation. */
  def fromBytes(bytes: Array[Byte]): GridHistogram = {
    require(bytes.length >= 45, "grid-histogram export too short")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val version = buf.get()
    require(version == 1, s"unknown grid-histogram export version $version")
    val lo = java.lang.Double.longBitsToDouble(buf.getLong())
    val hi = java.lang.Double.longBitsToDouble(buf.getLong())
    val buckets = buf.getInt()
    require(bytes.length == 45 + 8L * buckets,
      s"grid-histogram export length ${bytes.length} != ${45 + 8L * buckets}")
    val h = new GridHistogram(lo, hi, buckets)
    h.under = buf.getLong(); h.over = buf.getLong(); h.nan = buf.getLong()
    var i = 0
    while (i < buckets) { h.counts(i) = buf.getLong(); i += 1 }
    h
  }
}
