package graft.sketch

/** Mergeable KMV / theta sketch for distinct counting WITH set algebra.
  *
  * Complements [[HyperLogLog]] (capability parity with the reference's
  * `HyperLogLog`, /root/reference/amadeus-streaming/src/distinct.rs:133+):
  * HLL unions perfectly but can only estimate an intersection by
  * inclusion–exclusion, whose absolute error is driven by the LARGEST of
  * the three set sizes — useless for a small overlap of two big sets. The
  * theta framework (Beyer et al. 2007 "On synopses for distinct-value
  * estimation"; Dasgupta et al. 2016 "Theta sketch framework") keeps the
  * k smallest distinct hash values, so any finished pair of sketches
  * supports DIRECT union / intersection / difference estimates whose
  * error scales with the result, not with the inputs.
  *
  * All state and all set operations live in INTEGER hash space
  * (`[0, 2^domainBits)`); doubles appear only in the final one-division
  * estimate. That makes every estimate a pure function of the k smallest
  * hash values — bit-replayable by any engine with the same hash (the
  * sk17 gate feeds 48-bit md5 prefixes and DuckDB replays the whole
  * sketch relationally, `ORDER BY v LIMIT k`).
  *
  * Semantics (inclusive-theta KMV convention):
  *  - retained `R` = k smallest distinct values (all values if < k seen);
  *  - `thetaRaw`   = domain size while not full, else max(R) — so the
  *    "valid sample" `{v ∈ R : v < thetaRaw}` has inclusion probability
  *    `thetaRaw / domain` per distinct value;
  *  - estimate     = |valid| · domain / thetaRaw  — exactly `|R|` (exact
  *    count) below k, `(k−1)·domain/max(R)` when full;
  *  - set ops at `theta = min(thetaA, thetaB)`: every hash below theta is
  *    retained by BOTH sketches, so membership tests are exact there.
  *
  * State is ≤ k longs regardless of stream size — safe as a partial-agg
  * buffer at any scale; merge is the same bounded insert.
  */
final class Theta(val k: Int, val domainBits: Int = 48) extends Serializable {
  require(k >= 16, s"theta sketch k=$k too small (need >= 16)")
  require(domainBits >= 8 && domainBits <= 62,
    s"domainBits=$domainBits out of [8,62]")

  /** 2^domainBits as Long (exact) — the hash domain size. */
  val domain: Long = 1L << domainBits

  // k smallest distinct raw hash values seen so far (natural Long order —
  // values are required non-negative and < domain, so no unsigned games)
  private[sketch] val values = new java.util.TreeSet[java.lang.Long]()

  def size: Int = values.size
  def isFull: Boolean = values.size >= k

  /** Largest retained value while full, else the domain size (= "no
    * filtering yet": every value survives). Monotonically non-increasing
    * in stream length; the unit of all cross-sketch set ops. */
  def thetaRaw: Long = if (isFull) values.last() else domain

  /** Insert a raw pre-hashed value in [0, domain). Bounded: once full,
    * only values below the current max enter (and evict the max). */
  def addRaw(v: Long): this.type = {
    require(v >= 0 && v < domain, s"theta hash $v outside [0, $domain)")
    if (values.size < k) { values.add(v); () }
    else if (v < values.last()) {
      if (values.add(v)) { values.pollLast(); () }
    }
    this
  }

  /** Hash-and-insert for arbitrary values (production path; the gate path
    * feeds in-plan md5 prefixes through [[addRaw]] for replayability). */
  def add(v: Any): this.type =
    addRaw(graft.functions.Hashing.hashAny(v, 0x7e7aL) >>> (64 - domainBits))

  /** Union merge: k smallest of the combined retained sets. Commutative,
    * associative, idempotent (bounded insert of distinct values). */
  def merge(o: Theta): Theta = {
    require(o.k == k && o.domainBits == domainBits,
      s"theta param mismatch: ($k,$domainBits) vs (${o.k},${o.domainBits})")
    val out = new Theta(k, domainBits)
    val ia = values.iterator(); while (ia.hasNext) out.addRaw(ia.next())
    val ib = o.values.iterator(); while (ib.hasNext) out.addRaw(ib.next())
    out
  }

  /** Distinct-count estimate: exact below k, else (k−1)·domain/max(R). */
  def estimate: Double =
    if (!isFull) values.size.toDouble
    else (k - 1).toDouble * domain.toDouble / values.last().toDouble

  def cardinality: Long = math.round(estimate)

  /** Relative standard error when full: ~1/sqrt(k−2). */
  def errorRate: Double = 1.0 / math.sqrt((k - 2).toDouble)

  /** Versioned, byte-stable export:
    * `[version=1, k (4B BE), domainBits (1B), n (4B BE), n values
    * (8B BE each, ASCENDING)]` — engine-neutral like
    * [[HyperLogLog.toBytes]] (the sk22 gate rebuilds the identical byte
    * string in pure SQL and matches its fingerprint). Ascending order
    * makes the encoding canonical: equal sketches ⇒ equal bytes. */
  def toBytes: Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(1 + 4 + 1 + 4 + 8 * values.size)
    buf.put(1.toByte).putInt(k).put(domainBits.toByte).putInt(values.size)
    val it = values.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  override def equals(other: Any): Boolean = other match {
    case o: Theta => o.k == k && o.domainBits == domainBits && o.values == values
    case _ => false
  }
  override def hashCode: Int = values.hashCode
}

object Theta {

  /** Parse a [[Theta.toBytes]] export — loud validation, never silent
    * garbage from foreign bytes. */
  def fromBytes(bytes: Array[Byte]): Theta = {
    require(bytes.length >= 10, "theta export too short")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val version = buf.get()
    require(version == 1, s"unknown theta export version $version")
    val k = buf.getInt()
    val domainBits = buf.get().toInt
    val n = buf.getInt()
    require(bytes.length == 10 + 8L * n,
      s"theta export length ${bytes.length} != ${10 + 8L * n} for n=$n")
    require(n <= k, s"theta export carries $n values > k=$k")
    val t = new Theta(k, domainBits)
    var i = 0
    while (i < n) { t.addRaw(buf.getLong()); i += 1 }
    require(t.size == n, "theta export contained duplicate values")
    t
  }

  /** Count of a's retained values strictly below `theta` that satisfy
    * `p` — the shared core of the direct set-op estimators. */
  private def validCount(a: Theta, theta: Long)(p: Long => Boolean): Int = {
    var n = 0
    val it = a.values.iterator()
    var go = true
    while (go && it.hasNext) {
      val v = it.next().longValue()
      if (v >= theta) go = false // TreeSet iterates ascending
      else if (p(v)) n += 1
    }
    n
  }

  /** Direct |A ∩ B| estimate at theta = min(thetaA, thetaB): every hash
    * below theta is retained by both sketches, so the membership test is
    * exact on the sampled region. Exact (not an estimate) while both
    * sketches are below k. */
  def intersectionEstimate(a: Theta, b: Theta): Double = {
    require(a.k == b.k && a.domainBits == b.domainBits, "theta param mismatch")
    val theta = math.min(a.thetaRaw, b.thetaRaw)
    val n = validCount(a, theta)(v => b.values.contains(v))
    n.toDouble * a.domain.toDouble / theta.toDouble
  }

  /** Direct |A \ B| estimate at theta = min(thetaA, thetaB) — the
    * "how many of yesterday's users did we lose" number that
    * inclusion–exclusion on HLLs cannot resolve. */
  def aNotBEstimate(a: Theta, b: Theta): Double = {
    require(a.k == b.k && a.domainBits == b.domainBits, "theta param mismatch")
    val theta = math.min(a.thetaRaw, b.thetaRaw)
    val n = validCount(a, theta)(v => !b.values.contains(v))
    n.toDouble * a.domain.toDouble / theta.toDouble
  }

  /** Jaccard similarity estimate |A∩B| / |A∪B| at the common theta. */
  def jaccardEstimate(a: Theta, b: Theta): Double = {
    require(a.k == b.k && a.domainBits == b.domainBits, "theta param mismatch")
    val theta = math.min(a.thetaRaw, b.thetaRaw)
    val inter = validCount(a, theta)(v => b.values.contains(v))
    val aOnly = validCount(a, theta)(v => !b.values.contains(v))
    val bOnly = validCount(b, theta)(v => !a.values.contains(v))
    val union = inter + aOnly + bOnly
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }
}
