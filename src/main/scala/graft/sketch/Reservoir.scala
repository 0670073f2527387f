package graft.sketch

import graft.functions.Hashing
import scala.collection.mutable.ArrayBuffer

/** Exact-k mergeable uniform reservoir sample.
  *
  * Capability parity with the reference's `SampleUnstable`
  * (/root/reference/amadeus-streaming/src/sample.rs:125-220): classic
  * Vitter reservoir per partition, plus the size-weighted merge — each
  * output slot draws from a side with probability proportional to the
  * remaining (unsampled-stream-size) weight, so the merged reservoir is a
  * uniform sample of the concatenated stream.
  *
  * Randomness is a counter-keyed splitmix64 stream seeded from a fixed
  * seed: deterministic given (seed, arrival order), no RNG object state.
  */
final class Reservoir[T](val k: Int, val seed: Long) extends Serializable {
  require(k > 0)
  val items: ArrayBuffer[T] = ArrayBuffer.empty
  var seen: Long = 0L
  private var draws: Long = 0L

  private def nextLong(): Long = {
    draws += 1
    Hashing.mix64(seed ^ Hashing.mix64(draws))
  }
  /** uniform in [0, bound) */
  private def nextBounded(bound: Long): Long =
    java.lang.Math.floorMod(nextLong(), bound)
  private def nextDouble(): Double =
    (nextLong() >>> 11) * 1.1102230246251565e-16 // 2^-53

  def add(t: T): this.type = {
    seen += 1
    if (items.length < k) items += t
    else {
      val j = nextBounded(seen)
      if (j < k) items(j.toInt) = t
    }
    this
  }

  /** Size-weighted union: uniform over the concatenation of both streams. */
  def merge(o: Reservoir[T]): Reservoir[T] = {
    require(o.k == k, "Reservoir capacity mismatch")
    val out = new Reservoir[T](k, Hashing.mix64(seed ^ o.seed))
    out.seen = seen + o.seen
    val a = items.clone(); val b = o.items.clone()
    var wa = seen.toDouble; var wb = o.seen.toDouble
    while (out.items.length < k && (a.nonEmpty || b.nonEmpty)) {
      val takeA =
        if (b.isEmpty) true
        else if (a.isEmpty) false
        else out.nextDouble() < wa / (wa + wb)
      if (takeA) {
        val i = out.nextBounded(a.length.toLong).toInt
        out.items += a.remove(i)
        wa -= 1
      } else {
        val i = out.nextBounded(b.length.toLong).toInt
        out.items += b.remove(i)
        wb -= 1
      }
    }
    out
  }
}

/** Bounded top-n by an ordering — the reference's `Sort` sketch
  * (/root/reference/amadeus-streaming/src/sort.rs:18-81): capacity-n
  * buffer evicting the current maximum. At the Dataset level prefer
  * `orderBy(...).limit(n)` (Catalyst TakeOrderedAndProject); this class is
  * for use as per-group aggregation state. */
final class BoundedSort[T](val n: Int, val ord: Ordering[T]) extends Serializable {
  require(n > 0)
  // max-heap on ord: root is the worst retained element, evicted first
  private val heap = new java.util.PriorityQueue[T](n, ord.reverse)

  def add(t: T): this.type = {
    if (heap.size < n) heap.add(t)
    else if (ord.lt(t, heap.peek)) { heap.poll(); heap.add(t) }
    this
  }

  def merge(o: BoundedSort[T]): BoundedSort[T] = {
    val out = new BoundedSort[T](n, ord)
    heap.forEach(t => out.add(t))
    o.heap.forEach(t => out.add(t))
    out
  }

  /** Ascending by ord — the n smallest. */
  def sorted: Seq[T] = {
    val buf = ArrayBuffer.empty[T]
    heap.forEach(t => buf += t)
    buf.sorted(ord).toSeq
  }
}
