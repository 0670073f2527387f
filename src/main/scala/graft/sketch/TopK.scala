package graft.sketch

import scala.collection.mutable

/** Heavy-hitters sketches: top-n keys by aggregated value, with a bounded
  * tracked-key map backed by a Count-Min sketch for the untracked tail.
  *
  * Capability parity with the reference's `Top<A, C>`
  * (/root/reference/amadeus-streaming/src/top.rs:11-120): `C = usize` is
  * mostFrequent ("SELECT k ORDER BY count(*) DESC LIMIT n"), `C = HLL` is
  * mostDistinct ("SELECT k ORDER BY count(DISTINCT v) DESC LIMIT n").
  * Algorithm family: Filtered Space-Saving — untracked keys accumulate in
  * the CMS; a key is promoted when its estimate beats the smallest tracked
  * entry. State is O(n + depth*width) regardless of stream size.
  */
final class TopFreq[K](val n: Int, val depth: Int, val width: Int,
    val capacity: Int = 0) extends Serializable {
  // tracking slack: hold 4n counters, report n. Space-Saving's count
  // error is ≤ N/tracked, so the boundary churn that misranks keys sits
  // at rank ~4n while the REPORTED top n stay well inside the guarantee
  // — the standard fix for near-tied distributions at O(n) extra memory.
  // (SketchSpec pins ≥19/20 overlap vs exact under Zipf; near-uniform
  // data where ranks n..4n are within CMS tolerance of each other
  // remains genuinely unrankable by any bounded-memory sketch.)
  val cap: Int = if (capacity > 0) capacity else math.max(n, 4 * n)
  val heavy: mutable.HashMap[K, Long] = mutable.HashMap.empty
  val cms: CountMinLong = new CountMinLong(depth, width)

  // cached minimum tracked entry: on near-uniform streams most pushes
  // are untracked keys, and a fresh minBy per push is an O(n) scan with
  // a tuple allocation — the dominant cost of the whole sketch. The
  // cache is invalidated (rescanned lazily) whenever the tracked map
  // changes in a way that can move the minimum. Among tied minima the
  // evicted key is the cache's scan order rather than a per-push scan
  // order — any such choice is a valid Filtered-Space-Saving instance.
  // Validity lives in a dedicated Boolean (NOT a sentinel value of
  // minVal): deserialization skips @transient initializers and zeroes
  // the fields, and `false` is exactly the invalid state — a sentinel
  // like -1L would deserialize to 0L and read as a valid cache with a
  // null minKey.
  @transient private var minValid: Boolean = false
  @transient private var minVal: Long = 0L
  @transient private var minKey: K = _

  private def refreshMin(): Unit = {
    var mv = Long.MaxValue
    var mk: K = null.asInstanceOf[K]
    val it = heavy.iterator
    while (it.hasNext) {
      val e = it.next()
      if (e._2 < mv) { mv = e._2; mk = e._1 }
    }
    minVal = mv; minKey = mk; minValid = true
  }

  def push(k: K, c: Long = 1L): this.type = {
    heavy.get(k) match {
      case Some(v) =>
        heavy.update(k, v + c)
        if (minValid && k == minKey) minValid = false // min grew; rescan lazily
      case None =>
        val est = cms.addConservative(k, c)
        if (heavy.size < cap) {
          heavy.update(k, est)
          minValid = false
        } else {
          if (!minValid) refreshMin()
          if (est > minVal) {
            heavy.remove(minKey); heavy.update(k, est)
            minValid = false
          }
        }
    }
    this
  }

  /** Merge: union CMS, combine per-key totals (tracked count, else that
    * side's CMS estimate), keep the top `cap` tracked (slack preserved
    * through partial-agg merges so the final topN still has margin).
    * Commutative. Cap-boundary count ties break on (count DESC,
    * String.valueOf key ASC) — deterministic across HashMap iteration
    * and operand order (the same ordering [[topN]] reports). */
  def merge(o: TopFreq[K]): TopFreq[K] =
    mergeWith(o, (a: K, b: K) => String.valueOf(a) < String.valueOf(b))

  /** [[merge]] with the CANONICAL byte-export tie-break (count DESC,
    * `kc.lt` key ASC — the exact order [[toBytes]] writes and the
    * sk25/sk26 SQL rebuilds compute with `ORDER BY cnt DESC, key`).
    * The byte-table aggregators merge with THIS form so a merged
    * shard's tracked SET cannot differ from the relational rebuild at
    * a tied cap boundary: String.valueOf ordering disagrees with the
    * codec order for numeric keys ("10" < "9" lexicographically) and
    * for supplementary-plane strings (UTF-16 vs UTF-8 byte order). */
  def mergeCanonical(o: TopFreq[K])(implicit kc: KeyCodec[K]): TopFreq[K] =
    mergeWith(o, (a: K, b: K) => kc.lt(a, b))

  private def mergeWith(o: TopFreq[K], lt: (K, K) => Boolean): TopFreq[K] = {
    require(o.n == n && o.depth == depth && o.width == width && o.cap == cap,
      "TopFreq shape mismatch")
    val out = new TopFreq[K](n, depth, width, cap)
    val merged = cms.merge(o.cms)
    System.arraycopy(merged.cells, 0, out.cms.cells, 0, merged.cells.length)
    def side(t: TopFreq[K], k: K): Long =
      t.heavy.getOrElse(k, if (t.cms.estimate(k) > 0) t.cms.estimate(k) else 0L)
    val keys = heavy.keySet ++ o.heavy.keySet
    val totals = keys.toSeq.map(k => k -> (side(this, k) + side(o, k)))
    // deterministic tie-break at the cap boundary: a bare sortBy(-count)
    // is stable over HashMap keySet iteration order, so WHICH tied keys
    // survive take(cap) would depend on partition merge order and the
    // merged shard export would not be run-to-run byte-identical
    totals.sortWith { case ((k1, v1), (k2, v2)) =>
        v1 > v2 || (v1 == v2 && lt(k1, k2)) }
      .take(cap).foreach { case (k, v) => out.heavy.update(k, v) }
    out
  }

  /** Descending by count; ties broken by key string for determinism. */
  def topN: Seq[(K, Long)] =
    heavy.toSeq.sortBy { case (k, v) => (-v, String.valueOf(k)) }.take(n)

  /** Versioned, byte-stable export of the FULL mergeable state — the
    * tracked (key, count) map plus the Count-Min tail counters (the
    * reference's marquee sketch,
    * /root/reference/amadeus-streaming/src/top.rs:39-44 +
    * count_min.rs:42-116, previously reachable only through Kryo
    * buffers). Layout, all big-endian:
    *
    * `[version=1][keyType][depth][width 4B][n 4B][cap 4B][m 4B]`,
    * then `m` tracked entries sorted by (count DESC, key ASC — the
    * canonical heavy-hitter ranking, SQL-replayable as
    * `ORDER BY cnt DESC, key`): `[keyLen 4B][key][count 8B]`,
    * then `depth*width` CMS cells (`8B` each, row-major).
    *
    * The sk25 gate rebuilds this byte string relationally in DuckDB —
    * entries from exact GROUP BY counts, cells by replaying the
    * documented splitmix64 double-hash slot function — and matches the
    * md5, the same cross-engine property sk20 proves for HLL. */
  def toBytes(implicit kc: KeyCodec[K]): Array[Byte] = {
    val entries = heavy.toSeq
      .map { case (k, v) => (kc.write(k), k, v) }
      .sortWith { case ((_, k1, v1), (_, k2, v2)) =>
        v1 > v2 || (v1 == v2 && kc.lt(k1, k2)) }
    val entryLen = entries.map(e => 4 + e._1.length + 8).sum
    val buf = java.nio.ByteBuffer.allocate(19 + entryLen + 8 * cms.cells.length)
    buf.put(1.toByte).put(kc.typeId).put(depth.toByte)
      .putInt(width).putInt(n).putInt(cap).putInt(entries.size)
    entries.foreach { case (kb, _, v) =>
      buf.putInt(kb.length).put(kb).putLong(v)
    }
    var i = 0
    while (i < cms.cells.length) { buf.putLong(cms.cells(i)); i += 1 }
    buf.array()
  }
}

object TopFreq {
  /** Reference parameter shape: most_frequent(n, probability, tolerance). */
  def apply[K](n: Int, probability: Double, tolerance: Double): TopFreq[K] = {
    val (d, w) = CountMin.shape(probability, tolerance)
    new TopFreq[K](n, d, w)
  }

  /** Parse a [[TopFreq.toBytes]] export — loud validation (version, key
    * type, structural lengths), never silent garbage from foreign
    * bytes. The result merges/pushes like the original. */
  def fromBytes[K](bytes: Array[Byte])(implicit kc: KeyCodec[K]): TopFreq[K] = {
    require(bytes.length >= 19, "TopFreq export too short")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val version = buf.get()
    require(version == 1, s"unknown TopFreq export version $version")
    val keyType = buf.get()
    require(keyType == kc.typeId,
      s"TopFreq export key type $keyType != codec ${kc.typeId}")
    val depth = buf.get().toInt
    val width = buf.getInt()
    val n = buf.getInt()
    val cap = buf.getInt()
    val m = buf.getInt()
    require(depth > 0 && width > 0 && n > 0 && cap >= n && m >= 0 && m <= cap,
      s"TopFreq export header invalid (d=$depth w=$width n=$n cap=$cap m=$m)")
    val t = new TopFreq[K](n, depth, width, cap)
    var i = 0
    while (i < m) {
      val kl = buf.getInt()
      require(kl >= 0 && kl <= buf.remaining - 8,
        s"TopFreq export entry $i key length $kl overruns buffer")
      val kb = new Array[Byte](kl)
      buf.get(kb)
      t.heavy.update(kc.read(kb), buf.getLong())
      i += 1
    }
    require(buf.remaining == 8 * depth * width,
      s"TopFreq export cells ${buf.remaining} bytes != ${8 * depth * width}")
    i = 0
    while (i < t.cms.cells.length) { t.cms.cells(i) = buf.getLong(); i += 1 }
    t
  }
}

/** Top-n keys by approximate COUNT(DISTINCT value): tracked keys hold an
  * HLL each; the tail lives in a CountMin of HLL cells unioned together
  * (reference `Top<A, HyperLogLogMagnitude<B>>`,
  * /root/reference/amadeus-streaming/src/lib.rs:18 +
  * par_sink/sample.rs:157-213). */
final class TopDistinct[K](val n: Int, val depth: Int, val width: Int, val hllB: Int,
    val capacity: Int = 0) extends Serializable {
  /** same tracking-slack rationale as [[TopFreq]]: hold 4n, report n */
  val cap: Int = if (capacity > 0) capacity else math.max(n, 4 * n)
  val monoid = new HllMonoid(hllB)
  val heavy: mutable.HashMap[K, HyperLogLog] = mutable.HashMap.empty
  val cms: CountMin[HyperLogLog] = new CountMin[HyperLogLog](depth, width, monoid)

  def push(k: K, v: Any): this.type = {
    heavy.get(k) match {
      case Some(h) => h.add(v)
      case None =>
        val single = new HyperLogLog(hllB).add(v)
        cms.add(k, single)
        val est = cms.estimate(k)
        if (heavy.size < cap) heavy.update(k, est.merge(monoid.zero))
        else {
          val (mk, mv) = heavy.minBy { case (_, h) => h.estimate }
          if (est.estimate > mv.estimate) { heavy.remove(mk); heavy.update(k, est.merge(monoid.zero)) }
        }
    }
    this
  }

  def merge(o: TopDistinct[K]): TopDistinct[K] = {
    require(o.n == n && o.depth == depth && o.width == width && o.hllB == hllB &&
      o.cap == cap, "TopDistinct shape mismatch")
    val out = new TopDistinct[K](n, depth, width, hllB, cap)
    val merged = cms.merge(o.cms)
    System.arraycopy(merged.cells, 0, out.cms.cells, 0, merged.cells.length)
    def side(t: TopDistinct[K], k: K): Option[HyperLogLog] =
      t.heavy.get(k).orElse(Some(t.cms.estimate(k)))
    val keys = heavy.keySet ++ o.heavy.keySet
    val totals = keys.toSeq.map { k =>
      val h = (side(this, k).toList ++ side(o, k).toList)
        .foldLeft(monoid.zero)(monoid.plus)
      k -> h
    }
    totals.sortBy { case (k, h) => (-h.estimate, String.valueOf(k)) }
      .take(cap).foreach { case (k, h) => out.heavy.update(k, h) }
    out
  }

  def topN: Seq[(K, Long)] =
    heavy.toSeq.map { case (k, h) => k -> h.cardinality }
      .sortBy { case (k, v) => (-v, String.valueOf(k)) }.take(n)

  /** Versioned, byte-stable export of the FULL state: tracked keys each
    * carrying an [[HyperLogLog.toBytes]] register block, then the CMS
    * tail of HLL cells (reference `Top<A, HyperLogLogMagnitude<B>>`,
    * /root/reference/amadeus-streaming/src/lib.rs:18). Layout (BE):
    *
    * `[version=1][keyType][depth][width 4B][n 4B][cap 4B][hllB 1B]
    * [m 4B]`, then `m` entries sorted by key ASC (canonical — HLL
    * estimate ordering is a derived double, unfit for a byte layout):
    * `[keyLen 4B][key][(2+2^hllB) HLL bytes]`, then `depth*width` cells
    * of `(2+2^hllB)` HLL bytes each, row-major.
    *
    * Size is O((cap + depth·width)·2^hllB): a persisted-state format,
    * not a wire ping — size the CMS shape accordingly before sharding
    * this one to a sketch table. */
  def toBytes(implicit kc: KeyCodec[K]): Array[Byte] = {
    val hllLen = 2 + (1 << hllB)
    val sorted = heavy.toSeq.sortWith { case ((k1, _), (k2, _)) => kc.lt(k1, k2) }
      .map { case (k, h) => (kc.write(k), h) }
    val entryLen = sorted.map(e => 4 + e._1.length + hllLen).sum
    val buf = java.nio.ByteBuffer.allocate(20 + entryLen + hllLen * cms.cells.length)
    buf.put(1.toByte).put(kc.typeId).put(depth.toByte)
      .putInt(width).putInt(n).putInt(cap).put(hllB.toByte).putInt(sorted.size)
    sorted.foreach { case (kb, h) =>
      buf.putInt(kb.length).put(kb).put(h.toBytes)
    }
    var i = 0
    while (i < cms.cells.length) {
      buf.put(cms.cells(i).asInstanceOf[HyperLogLog].toBytes)
      i += 1
    }
    buf.array()
  }
}

object TopDistinct {
  /** Reference parameter shape:
    * most_distinct(n, probability, tolerance, error_rate). */
  def apply[K](n: Int, probability: Double, tolerance: Double,
               errorRate: Double): TopDistinct[K] = {
    val (d, w) = CountMin.shape(probability, tolerance)
    val b = HyperLogLog.forError(errorRate).b
    new TopDistinct[K](n, d, w, b)
  }

  /** Parse a [[TopDistinct.toBytes]] export — loud validation, full
    * mergeable state restored. */
  def fromBytes[K](bytes: Array[Byte])(implicit kc: KeyCodec[K]): TopDistinct[K] = {
    require(bytes.length >= 20, "TopDistinct export too short")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val version = buf.get()
    require(version == 1, s"unknown TopDistinct export version $version")
    val keyType = buf.get()
    require(keyType == kc.typeId,
      s"TopDistinct export key type $keyType != codec ${kc.typeId}")
    val depth = buf.get().toInt
    val width = buf.getInt()
    val n = buf.getInt()
    val cap = buf.getInt()
    val hllB = buf.get().toInt
    val m = buf.getInt()
    // hllB bounds BEFORE 1 << hllB: a corrupt byte would otherwise wrap
    // the shift into a garbage/negative cell length and surface as a
    // NegativeArraySizeException instead of this loud message
    require(depth > 0 && width > 0 && n > 0 && cap >= n && m >= 0 && m <= cap &&
      hllB >= 4 && hllB <= 18,
      s"TopDistinct export header invalid (d=$depth w=$width n=$n cap=$cap " +
        s"m=$m hllB=$hllB)")
    val hllLen = 2 + (1 << hllB)
    def readHll(): HyperLogLog = {
      val hb = new Array[Byte](hllLen)
      buf.get(hb)
      val h = HyperLogLog.fromBytes(hb)
      require(h.b == hllB, s"TopDistinct cell precision ${h.b} != header $hllB")
      h
    }
    val t = new TopDistinct[K](n, depth, width, hllB, cap)
    var i = 0
    while (i < m) {
      val kl = buf.getInt()
      require(kl >= 0 && kl <= buf.remaining - hllLen,
        s"TopDistinct export entry $i key length $kl overruns buffer")
      val kb = new Array[Byte](kl)
      buf.get(kb)
      t.heavy.update(kc.read(kb), readHll())
      i += 1
    }
    require(buf.remaining == hllLen * depth * width,
      s"TopDistinct export cells ${buf.remaining} bytes != ${hllLen * depth * width}")
    i = 0
    while (i < t.cms.cells.length) {
      t.cms.cells(i) = readHll().asInstanceOf[AnyRef]
      i += 1
    }
    t
  }
}
