package graft.sketch

import graft.functions.Hashing

/** Mergeable HyperLogLog cardinality sketch.
  *
  * Capability parity with the reference's `HyperLogLog`
  * (/root/reference/amadeus-streaming/src/distinct.rs:133+): fixed-size
  * register array, union merge, estimate with small-range linear counting.
  * Built from the published HyperLogLog algorithm (Flajolet et al. 2007);
  * 64-bit hashing removes the need for the large-range correction.
  *
  * State is `2^b` bytes regardless of stream size — safe as a partial-agg
  * buffer at any scale.
  */
final class HyperLogLog(val b: Int) extends Serializable {
  require(b >= 4 && b <= 18, s"HLL precision b=$b out of [4,18]")
  val m: Int = 1 << b
  val registers: Array[Byte] = new Array[Byte](m)

  def addHash(h: Long): this.type = {
    val idx = (h >>> (64 - b)).toInt
    // rank = leading zeros of the remaining 64-b bits, +1; the or-ed guard
    // bit bounds the rank when those bits are all zero
    val rank = java.lang.Long.numberOfLeadingZeros((h << b) | (1L << (b - 1))) + 1
    if (rank > registers(idx)) registers(idx) = rank.toByte
    this
  }

  def add(v: Any): this.type = addHash(Hashing.hashAny(v, 0x9c3779b9L))

  /** Union-merge: register-wise max. Commutative, associative, idempotent. */
  def merge(o: HyperLogLog): HyperLogLog = {
    require(o.b == b, s"HLL precision mismatch: $b vs ${o.b}")
    val out = new HyperLogLog(b)
    var i = 0
    while (i < m) {
      val a = registers(i); val c = o.registers(i)
      out.registers(i) = if (a > c) a else c
      i += 1
    }
    out
  }

  private def alpha: Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  def estimate: Double = {
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = registers(i)
      sum += java.lang.Double.longBitsToDouble((1023L - r) << 52) // 2^-r
      if (r == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
    else raw
  }

  def cardinality: Long = math.round(estimate)

  /** Versioned, byte-stable dense export: `[version=1, b, registers…]`
    * (2 + 2^b bytes). The format is engine-neutral and documented — the
    * sk20 gate rebuilds the identical byte string relationally in
    * DuckDB from the raw data and matches its fingerprint, the
    * cross-system interop property the reference proves against
    * BigQuery's HLL++ encoding
    * (/root/reference/amadeus-streaming/src/distinct.rs:738-756). */
  def toBytes: Array[Byte] = {
    val out = new Array[Byte](2 + m)
    out(0) = 1
    out(1) = b.toByte
    System.arraycopy(registers, 0, out, 2, m)
    out
  }

  /** [[estimate]] in the replayable rational form used by the sk20
    * interop gate: the register sum Σ2⁻ʳ is carried as the EXACT
    * integer Σ2^(R−r) (R = 65−b, the max possible rank), so any engine
    * reproduces the final double bit-for-bit from the exported
    * registers with one int→double cast and one division. Equal to
    * [[estimate]] up to that sum's float-summation ulps; identical
    * branch logic (small-range linear counting included). */
  def estimateReplayable: Double = {
    val bigR = 65 - b
    var zeros = 0
    var s = BigInt(0)
    var i = 0
    while (i < m) {
      val r = registers(i)
      if (r == 0) zeros += 1
      s += BigInt(1) << (bigR - r)
      i += 1
    }
    val raw = alpha * m * m * math.pow(2.0, bigR.toDouble) / s.toDouble
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  /** Standard error of the estimate: 1.04 / sqrt(m). */
  def errorRate: Double = 1.04 / math.sqrt(m.toDouble)

  override def equals(other: Any): Boolean = other match {
    case o: HyperLogLog => o.b == b && java.util.Arrays.equals(o.registers, registers)
    case _ => false
  }
  override def hashCode: Int = java.util.Arrays.hashCode(registers)
}

object HyperLogLog {
  /** Inclusion-exclusion intersection estimate |A∩B| ≈ |A|+|B|−|A∪B|.
    * The union sketch is exact HLL semantics (register max), so the
    * absolute error is bounded by the three estimates' errors combined:
    * ~σ·(|A|+|B|+|A∪B|) standard deviations — useful when the
    * intersection is not tiny relative to the sets (the classic HLL
    * set-algebra caveat). */
  def intersectionEstimate(a: HyperLogLog, b: HyperLogLog): Double =
    a.estimate + b.estimate - a.merge(b).estimate

  /** Jaccard similarity estimate |A∩B|/|A∪B| via inclusion-exclusion. */
  def jaccardEstimate(a: HyperLogLog, b: HyperLogLog): Double = {
    val u = a.merge(b).estimate
    if (u <= 0) 0.0 else math.max(0.0, intersectionEstimate(a, b)) / u
  }

  /** Parse a [[HyperLogLog.toBytes]] export — validates version and
    * length, so a foreign byte string fails loudly, never silently. */
  def fromBytes(bytes: Array[Byte]): HyperLogLog = {
    require(bytes.length >= 2, "HLL export too short")
    require(bytes(0) == 1, s"unknown HLL export version ${bytes(0)}")
    val h = new HyperLogLog(bytes(1).toInt)
    require(bytes.length == 2 + h.m,
      s"HLL export length ${bytes.length} != ${2 + h.m} for b=${h.b}")
    System.arraycopy(bytes, 2, h.registers, 0, h.m)
    h
  }

  /** Precision from a target standard error (reference constructor shape:
    * `HyperLogLog::new(error_rate)`). */
  def forError(errorRate: Double): HyperLogLog = {
    val m = math.pow(1.04 / errorRate, 2.0)
    val b = math.max(4, math.min(18, math.ceil(math.log(m) / math.log(2.0)).toInt))
    new HyperLogLog(b)
  }
}
