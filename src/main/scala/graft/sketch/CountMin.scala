package graft.sketch

import graft.functions.Hashing

/** Commutative-monoid cell values for generic sketches: Long counts for
  * classic CountMin / mostFrequent, HyperLogLog cells for the
  * count-distinct-per-key variant (reference `HyperLogLogMagnitude`,
  * /root/reference/amadeus-streaming/src/distinct.rs:70-131). */
trait ValueMonoid[V] extends Serializable {
  def zero: V
  def plus(a: V, b: V): V
  /** total order used for top-k ranking and CMS "min over rows" */
  def score(v: V): Double
}

object LongMonoid extends ValueMonoid[Long] {
  def zero = 0L
  def plus(a: Long, b: Long): Long = a + b
  def score(v: Long): Double = v.toDouble
}

final class HllMonoid(val b: Int) extends ValueMonoid[HyperLogLog] {
  def zero = new HyperLogLog(b)
  def plus(a: HyperLogLog, c: HyperLogLog): HyperLogLog = a.merge(c)
  def score(v: HyperLogLog): Double = v.estimate
}

/** Count-Min sketch generalized over a cell monoid.
  *
  * Capability parity with the reference's `CountMinSketch`
  * (/root/reference/amadeus-streaming/src/count_min.rs:42-140): width from
  * tolerance (e/tol), depth from confidence (ln(1/(1-p))), conservative
  * updating for Long counts, element-wise union merge. Fixed
  * `depth*width` state — scale-safe partial-agg buffer.
  */
final class CountMin[V](val depth: Int, val width: Int, val monoid: ValueMonoid[V])
    extends Serializable {
  require(depth > 0 && width > 0)
  // flat row-major Array[AnyRef]; boxing is acceptable off the hot codegen path
  val cells: Array[AnyRef] = {
    val a = new Array[AnyRef](depth * width)
    java.util.Arrays.fill(a, monoid.zero.asInstanceOf[AnyRef])
    a
  }

  // double hashing h1 + row*h2 gives depth pairwise-independent rows;
  // the key hashes are row-independent, so hash once per key
  @inline private def slotFromHashes(row: Int, h1: Long, h2: Long): Int =
    row * width + java.lang.Math.floorMod(h1 + row.toLong * h2, width.toLong).toInt

  @inline private def slot(row: Int, k: Any): Int =
    slotFromHashes(row,
      Hashing.hashAny(k, 0x5bd1e995L), Hashing.hashAny(k, 0x27d4eb2fL) | 1L)

  /** Monoid union add (used for HLL cells and for merged counts). */
  def add(k: Any, v: V): this.type = {
    val h1 = Hashing.hashAny(k, 0x5bd1e995L)
    val h2 = Hashing.hashAny(k, 0x27d4eb2fL) | 1L
    var r = 0
    while (r < depth) {
      val i = slotFromHashes(r, h1, h2)
      cells(i) = monoid.plus(cells(i).asInstanceOf[V], v).asInstanceOf[AnyRef]
      r += 1
    }
    this
  }

  def estimate(k: Any): V = {
    val h1 = Hashing.hashAny(k, 0x5bd1e995L)
    val h2 = Hashing.hashAny(k, 0x27d4eb2fL) | 1L
    var best = cells(slotFromHashes(0, h1, h2)).asInstanceOf[V]
    var r = 1
    while (r < depth) {
      val v = cells(slotFromHashes(r, h1, h2)).asInstanceOf[V]
      if (monoid.score(v) < monoid.score(best)) best = v
      r += 1
    }
    best
  }

  /** Element-wise union merge. */
  def merge(o: CountMin[V]): CountMin[V] = {
    require(o.depth == depth && o.width == width, "CountMin shape mismatch")
    val out = new CountMin[V](depth, width, monoid)
    var i = 0
    while (i < cells.length) {
      out.cells(i) = monoid.plus(cells(i).asInstanceOf[V], o.cells(i).asInstanceOf[V])
        .asInstanceOf[AnyRef]
      i += 1
    }
    out
  }
}

object CountMin {
  /** Reference constructor shape: probability + tolerance
    * (count_min.rs:42-74): width = ceil(e / tolerance),
    * depth = ceil(ln(1 / (1 - probability))). */
  def shape(probability: Double, tolerance: Double): (Int, Int) = {
    val depth = math.max(1, math.ceil(math.log(1.0 / (1.0 - probability))).toInt)
    val width = math.max(1, math.ceil(math.E / tolerance).toInt)
    (depth, width)
  }

  def longs(probability: Double, tolerance: Double): CountMinLong = {
    val (d, w) = shape(probability, tolerance)
    new CountMinLong(d, w)
  }
}

/** Specialized Long-count CountMin with conservative updating: on add,
  * counters are only raised to (current estimate + c), which provably
  * tightens overestimates versus plain CMS (count_min.rs:75-116 semantics).
  * Primitive array cells — this is the hot path for mostFrequent. */
final class CountMinLong(val depth: Int, val width: Int) extends Serializable {
  require(depth > 0 && width > 0)
  val cells: Array[Long] = new Array[Long](depth * width)

  // the two key hashes are row-independent: compute once per key, derive
  // each row's slot with one multiply-add (was 2*depth hashes per push)
  @inline private def slotFromHashes(row: Int, h1: Long, h2: Long): Int =
    row * width + java.lang.Math.floorMod(h1 + row.toLong * h2, width.toLong).toInt

  // per-push scratch, reused: buffer updates are single-threaded per
  // aggregation task, and a fresh Array per row is pure GC pressure
  @transient private var scratch: Array[Int] = _

  /** Conservative-update add; returns the post-update estimate. */
  def addConservative(k: Any, c: Long): Long = {
    if (scratch == null) scratch = new Array[Int](depth)
    val slots = scratch
    val h1 = Hashing.hashAny(k, 0x5bd1e995L)
    val h2 = Hashing.hashAny(k, 0x27d4eb2fL) | 1L
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      slots(r) = slotFromHashes(r, h1, h2)
      val v = cells(slots(r))
      if (v < est) est = v
      r += 1
    }
    val target = est + c
    r = 0
    while (r < depth) {
      if (cells(slots(r)) < target) cells(slots(r)) = target
      r += 1
    }
    target
  }

  def estimate(k: Any): Long = {
    val h1 = Hashing.hashAny(k, 0x5bd1e995L)
    val h2 = Hashing.hashAny(k, 0x27d4eb2fL) | 1L
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = cells(slotFromHashes(r, h1, h2))
      if (v < est) est = v
      r += 1
    }
    est
  }

  /** Element-wise sum merge (upper-bound preserving). */
  def merge(o: CountMinLong): CountMinLong = {
    require(o.depth == depth && o.width == width, "CountMin shape mismatch")
    val out = new CountMinLong(depth, width)
    var i = 0
    while (i < cells.length) { out.cells(i) = cells(i) + o.cells(i); i += 1 }
    out
  }
}
