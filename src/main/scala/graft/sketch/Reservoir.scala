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

  /** Versioned, byte-stable export of the FULL resumable state —
    * including the RNG draw counter, so a re-imported reservoir
    * continues the exact deterministic (seed, arrival order) stream the
    * original would have (reference `SampleUnstable`,
    * /root/reference/amadeus-streaming/src/sample.rs:125-220). Layout
    * (big-endian): `[version=1][elemType][k 4B][seed 8B][seen 8B]
    * [draws 8B][m 4B]`, then `m` slot-order entries `[len 4B][bytes]`
    * (slot order IS state: eviction replaces by index). */
  def toBytes(implicit kc: KeyCodec[T]): Array[Byte] = {
    val enc = items.map(kc.write)
    val buf = java.nio.ByteBuffer.allocate(34 + enc.map(4 + _.length).sum)
    buf.put(1.toByte).put(kc.typeId).putInt(k)
      .putLong(seed).putLong(seen).putLong(draws).putInt(enc.length)
    enc.foreach(b => buf.putInt(b.length).put(b))
    buf.array()
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

object Reservoir {
  /** Parse a [[Reservoir.toBytes]] export — loud validation; restores
    * the full resumable state (items, seen, RNG draw counter). */
  def fromBytes[T](bytes: Array[Byte])(implicit kc: KeyCodec[T]): Reservoir[T] = {
    require(bytes.length >= 34, "Reservoir export too short")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val version = buf.get()
    require(version == 1, s"unknown Reservoir export version $version")
    val elemType = buf.get()
    require(elemType == kc.typeId,
      s"Reservoir export element type $elemType != codec ${kc.typeId}")
    val k = buf.getInt()
    val seed = buf.getLong()
    val seen = buf.getLong()
    val draws = buf.getLong()
    val m = buf.getInt()
    require(k > 0 && m >= 0 && m <= k && seen >= m,
      s"Reservoir export header invalid (k=$k m=$m seen=$seen)")
    // class invariant, not just bounds: the reservoir holds EVERY element
    // until it is full, so m must equal min(seen, k) exactly. A truncated
    // or corrupt export with seen=100, m=3, k=10 passes the bounds check
    // but a resumed add() would APPEND instead of evicting — silently a
    // non-uniform sample. Fail loudly like the other fromBytes parsers.
    require(m == math.min(seen, k.toLong).toInt,
      s"Reservoir export violates m == min(seen, k) (k=$k m=$m seen=$seen)")
    val r = new Reservoir[T](k, seed)
    r.seen = seen
    r.draws = draws
    var i = 0
    while (i < m) {
      val len = buf.getInt()
      require(len >= 0 && len <= buf.remaining,
        s"Reservoir export entry $i length $len overruns buffer")
      val eb = new Array[Byte](len)
      buf.get(eb)
      r.items += kc.read(eb)
      i += 1
    }
    require(buf.remaining == 0,
      s"Reservoir export has ${buf.remaining} trailing bytes")
    r
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

  /** Versioned, byte-stable export: `[version=1][elemType][n 4B][m 4B]`,
    * then `m` entries `[len 4B][bytes]` ascending by `ord` (equal-ord
    * ties broken lexicographically on the encoded bytes so equal
    * retained sets always serialize identically). `ord` itself is code,
    * not data — [[BoundedSort.fromBytes]] takes it as an argument. */
  def toBytes(implicit kc: KeyCodec[T]): Array[Byte] = {
    val enc = sorted.map(t => (t, kc.write(t))).sortWith { case ((a, ab), (b, bb)) =>
      if (ord.lt(a, b)) true
      else if (ord.lt(b, a)) false
      else {
        // tie: unsigned lexicographic byte order
        val n = math.min(ab.length, bb.length)
        var i = 0
        while (i < n && ab(i) == bb(i)) i += 1
        if (i < n) (ab(i) & 0xff) < (bb(i) & 0xff) else ab.length < bb.length
      }
    }.map(_._2)
    val buf = java.nio.ByteBuffer.allocate(10 + enc.map(4 + _.length).sum)
    buf.put(1.toByte).put(kc.typeId).putInt(n).putInt(enc.length)
    enc.foreach(b => buf.putInt(b.length).put(b))
    buf.array()
  }
}

object BoundedSort {
  /** Parse a [[BoundedSort.toBytes]] export; `ord` must be the ordering
    * the sketch was built with (orderings are code, not data). */
  def fromBytes[T](bytes: Array[Byte], ord: Ordering[T])
      (implicit kc: KeyCodec[T]): BoundedSort[T] = {
    require(bytes.length >= 10, "BoundedSort export too short")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val version = buf.get()
    require(version == 1, s"unknown BoundedSort export version $version")
    val elemType = buf.get()
    require(elemType == kc.typeId,
      s"BoundedSort export element type $elemType != codec ${kc.typeId}")
    val n = buf.getInt()
    val m = buf.getInt()
    require(n > 0 && m >= 0 && m <= n,
      s"BoundedSort export header invalid (n=$n m=$m)")
    val out = new BoundedSort[T](n, ord)
    var i = 0
    while (i < m) {
      val len = buf.getInt()
      require(len >= 0 && len <= buf.remaining,
        s"BoundedSort export entry $i length $len overruns buffer")
      val eb = new Array[Byte](len)
      buf.get(eb)
      out.add(kc.read(eb))
      i += 1
    }
    require(buf.remaining == 0,
      s"BoundedSort export has ${buf.remaining} trailing bytes")
    out
  }
}
