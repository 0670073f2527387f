package graft.aggregators

import graft.sketch._
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Spark `Aggregator` wrappers over the sketch library — the reference's
  * terminal sinks (`most_frequent`, `most_distinct`, `sample_unstable`,
  * `sort_n_by`, mean/stddev) re-expressed as Catalyst aggregates so they
  * get partial aggregation (reference ReduceA), exchange merge (ReduceB)
  * and final merge (ReduceC) from the engine for free, with fixed-size
  * buffers that are safe at any data scale.
  *
  * Buffers are Kryo-encoded (opaque binary, ObjectHashAggregate path);
  * outputs use real SQL types so downstream plans stay columnar.
  */
object SketchAggregators {

  /** Like [[HllDistinct]] but finishes with the SKETCH, not the count —
    * the build side of HLL set algebra: union two results with `merge`,
    * intersect with `HyperLogLog.intersectionEstimate`. Distributed
    * union-merge happens in the partial/final aggregate; only the final
    * 2^b-byte sketch reaches the driver. */
  final class HllSketchAgg[IN](b: Int, f: IN => Any)
      extends Aggregator[IN, HyperLogLog, HyperLogLog] {
    def zero: HyperLogLog = new HyperLogLog(b)
    def reduce(buf: HyperLogLog, in: IN): HyperLogLog = buf.add(f(in))
    def merge(a: HyperLogLog, c: HyperLogLog): HyperLogLog = a.merge(c)
    def finish(r: HyperLogLog): HyperLogLog = r
    def bufferEncoder: Encoder[HyperLogLog] = Encoders.kryo[HyperLogLog]
    def outputEncoder: Encoder[HyperLogLog] = Encoders.kryo[HyperLogLog]
  }

  /** HLL build over PRE-HASHED 64-bit values (same discipline as
    * [[ThetaAgg]]): the hash stays in the PLAN — codegen'd `xxhash64`
    * in production, a 48-bit md5 prefix shifted to the top bits in the
    * sk20 gate so DuckDB can replay every register byte. */
  final class HllRawAgg[IN](b: Int, f: IN => Long)
      extends Aggregator[IN, HyperLogLog, HyperLogLog] {
    def zero: HyperLogLog = new HyperLogLog(b)
    def reduce(buf: HyperLogLog, in: IN): HyperLogLog = buf.addHash(f(in))
    def merge(a: HyperLogLog, c: HyperLogLog): HyperLogLog = a.merge(c)
    def finish(r: HyperLogLog): HyperLogLog = r
    def bufferEncoder: Encoder[HyperLogLog] = Encoders.kryo[HyperLogLog]
    def outputEncoder: Encoder[HyperLogLog] = Encoders.kryo[HyperLogLog]
  }

  /** [[HllRawAgg]] finishing to the BYTE-STABLE export
    * ([[graft.sketch.HyperLogLog.toBytes]]) — the build side of a
    * SKETCH TABLE: persist one binary sketch per (key, shard) in plain
    * parquet, then answer any distinct-count rollup over shards with
    * [[HllMergeBytesAgg]]/[[HllMergeEstimateAgg]] without touching the
    * raw data again (the BigQuery HLL_COUNT.INIT/MERGE pattern; sk21
    * hash-verifies the whole shard→merge→estimate path in DuckDB). */
  final class HllBytesRawAgg[IN](b: Int, f: IN => Long)
      extends Aggregator[IN, HyperLogLog, Array[Byte]] {
    def zero: HyperLogLog = new HyperLogLog(b)
    def reduce(buf: HyperLogLog, in: IN): HyperLogLog = buf.addHash(f(in))
    def merge(a: HyperLogLog, c: HyperLogLog): HyperLogLog = a.merge(c)
    def finish(r: HyperLogLog): Array[Byte] = r.toBytes
    def bufferEncoder: Encoder[HyperLogLog] = Encoders.kryo[HyperLogLog]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union-merge of exported sketch bytes → merged bytes (re-shard /
    * compact a sketch table). Input sketches must share precision `b`
    * ([[graft.sketch.HyperLogLog.fromBytes]] validates loudly). */
  final class HllMergeBytesAgg(b: Int)
      extends Aggregator[Array[Byte], HyperLogLog, Array[Byte]] {
    def zero: HyperLogLog = new HyperLogLog(b)
    def reduce(buf: HyperLogLog, in: Array[Byte]): HyperLogLog = {
      require(in != null, "null sketch bytes (outer-join-produced shard?)")
      buf.merge(HyperLogLog.fromBytes(in))
    }
    def merge(a: HyperLogLog, c: HyperLogLog): HyperLogLog = a.merge(c)
    def finish(r: HyperLogLog): Array[Byte] = r.toBytes
    def bufferEncoder: Encoder[HyperLogLog] = Encoders.kryo[HyperLogLog]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union-merge of exported sketch bytes → the distinct-count estimate
    * (query side of the sketch table), in the replayable rational form
    * so external engines reproduce it bit-for-bit. */
  final class HllMergeEstimateAgg(b: Int)
      extends Aggregator[Array[Byte], HyperLogLog, Double] {
    def zero: HyperLogLog = new HyperLogLog(b)
    def reduce(buf: HyperLogLog, in: Array[Byte]): HyperLogLog = {
      require(in != null, "null sketch bytes (outer-join-produced shard?)")
      buf.merge(HyperLogLog.fromBytes(in))
    }
    def merge(a: HyperLogLog, c: HyperLogLog): HyperLogLog = a.merge(c)
    def finish(r: HyperLogLog): Double = r.estimateReplayable
    def bufferEncoder: Encoder[HyperLogLog] = Encoders.kryo[HyperLogLog]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Theta/KMV sketch build over PRE-HASHED values in [0, 2^domainBits)
    * — the set-algebra companion to [[HllSketchAgg]] (direct
    * intersection/difference, see [[graft.sketch.Theta]]). Taking the
    * hash as input (rather than hashing in `reduce`) keeps the hash in
    * the PLAN — codegen'd `xxhash64` in production, 48-bit `md5` prefix
    * in the sk17 gate so DuckDB can replay the sketch relationally. */
  final class ThetaAgg[IN](k: Int, domainBits: Int, f: IN => Long)
      extends Aggregator[IN, Theta, Theta] {
    def zero: Theta = new Theta(k, domainBits)
    def reduce(buf: Theta, in: IN): Theta = buf.addRaw(f(in))
    def merge(a: Theta, c: Theta): Theta = a.merge(c)
    def finish(r: Theta): Theta = r
    def bufferEncoder: Encoder[Theta] = Encoders.kryo[Theta]
    def outputEncoder: Encoder[Theta] = Encoders.kryo[Theta]
  }

  /** [[ThetaAgg]] finishing to the byte-stable export
    * ([[graft.sketch.Theta.toBytes]]) — the theta side of the sketch
    * TABLE pattern (see [[HllBytesRawAgg]]); theta shards additionally
    * support direct set algebra after re-import. */
  final class ThetaBytesRawAgg[IN](k: Int, domainBits: Int, f: IN => Long)
      extends Aggregator[IN, Theta, Array[Byte]] {
    def zero: Theta = new Theta(k, domainBits)
    def reduce(buf: Theta, in: IN): Theta = buf.addRaw(f(in))
    def merge(a: Theta, c: Theta): Theta = a.merge(c)
    def finish(r: Theta): Array[Byte] = r.toBytes
    def bufferEncoder: Encoder[Theta] = Encoders.kryo[Theta]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union-merge of exported theta bytes → the distinct-count estimate
    * (query side of a theta sketch table). */
  final class ThetaMergeEstimateAgg(k: Int, domainBits: Int)
      extends Aggregator[Array[Byte], Theta, Double] {
    def zero: Theta = new Theta(k, domainBits)
    def reduce(buf: Theta, in: Array[Byte]): Theta = {
      require(in != null, "null sketch bytes (outer-join-produced shard?)")
      buf.merge(Theta.fromBytes(in))
    }
    def merge(a: Theta, c: Theta): Theta = a.merge(c)
    def finish(r: Theta): Double = r.estimate
    def bufferEncoder: Encoder[Theta] = Encoders.kryo[Theta]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** [[ThetaAgg]] finishing to the distinct-count ESTIMATE — the form a
    * streaming complete-mode sink can emit directly (st14 proves the
    * merged-across-micro-batches state equals the batch build). */
  final class ThetaDistinct[IN](k: Int, domainBits: Int, f: IN => Long)
      extends Aggregator[IN, Theta, Double] {
    def zero: Theta = new Theta(k, domainBits)
    def reduce(buf: Theta, in: IN): Theta = buf.addRaw(f(in))
    def merge(a: Theta, c: Theta): Theta = a.merge(c)
    def finish(r: Theta): Double = r.estimate
    def bufferEncoder: Encoder[Theta] = Encoders.kryo[Theta]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Fixed-grid histogram sketch build — mergeable quantiles with a
    * deterministic one-bucket-width error bound and exact-integer state
    * (see [[graft.sketch.GridHistogram]]; sk19 hash-verifies the whole
    * sketch against a relational replay). */
  final class GridHistogramAgg[IN](lo: Double, hi: Double, buckets: Int,
      f: IN => Double) extends Aggregator[IN, GridHistogram, GridHistogram] {
    def zero: GridHistogram = new GridHistogram(lo, hi, buckets)
    def reduce(buf: GridHistogram, in: IN): GridHistogram = buf.add(f(in))
    def merge(a: GridHistogram, c: GridHistogram): GridHistogram = a.merge(c)
    def finish(r: GridHistogram): GridHistogram = r
    def bufferEncoder: Encoder[GridHistogram] = Encoders.kryo[GridHistogram]
    def outputEncoder: Encoder[GridHistogram] = Encoders.kryo[GridHistogram]
  }

  /** approx COUNT(DISTINCT f(in)) — reference HyperLogLog sink. */
  final class HllDistinct[IN](b: Int, f: IN => Any)
      extends Aggregator[IN, HyperLogLog, Long] {
    def zero: HyperLogLog = new HyperLogLog(b)
    def reduce(buf: HyperLogLog, in: IN): HyperLogLog = buf.add(f(in))
    def merge(a: HyperLogLog, c: HyperLogLog): HyperLogLog = a.merge(c)
    def finish(r: HyperLogLog): Long = r.cardinality
    def bufferEncoder: Encoder[HyperLogLog] = Encoders.kryo[HyperLogLog]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** most_frequent(n, p, tol): top-n keys by count. */
  final class MostFrequent[IN, K](n: Int, probability: Double, tolerance: Double,
      key: IN => K)(implicit outEnc: Encoder[Seq[(K, Long)]])
      extends Aggregator[IN, TopFreq[K], Seq[(K, Long)]] {
    def zero: TopFreq[K] = TopFreq[K](n, probability, tolerance)
    def reduce(buf: TopFreq[K], in: IN): TopFreq[K] = buf.push(key(in))
    def merge(a: TopFreq[K], b: TopFreq[K]): TopFreq[K] = a.merge(b)
    def finish(r: TopFreq[K]): Seq[(K, Long)] = r.topN
    def bufferEncoder: Encoder[TopFreq[K]] = Encoders.kryo[TopFreq[K]]
    def outputEncoder: Encoder[Seq[(K, Long)]] = outEnc
  }

  /** [[MostFrequent]]'s explicit-shape build finishing to the
    * BYTE-STABLE export ([[graft.sketch.TopFreq.toBytes]]) — the build
    * side of a heavy-hitter SKETCH TABLE: persist one binary
    * Top+Count-Min state per (key, shard) in plain parquet, roll up
    * with [[TopFreqMergeTopNAgg]]/[[TopFreqMergeBytesAgg]] without
    * re-reading raw data (the pattern sk21/sk24 prove for HLL/theta;
    * sk25/sk26 prove it for this family). Shape is explicit
    * (depth/width, not probability/tolerance) because every shard and
    * the rollup must agree on it. */
  final class TopFreqBytesAgg[IN, K](n: Int, depth: Int, width: Int,
      key: IN => K, cnt: IN => Long = (_: IN) => 1L)(implicit kc: KeyCodec[K])
      extends Aggregator[IN, TopFreq[K], Array[Byte]] {
    def zero: TopFreq[K] = new TopFreq[K](n, depth, width)
    def reduce(buf: TopFreq[K], in: IN): TopFreq[K] = buf.push(key(in), cnt(in))
    // canonical-ranking merge: a byte-exporting agg must evict tied keys
    // in toBytes order or the SQL rebuild diverges at the cap boundary
    def merge(a: TopFreq[K], b: TopFreq[K]): TopFreq[K] = a.mergeCanonical(b)
    def finish(r: TopFreq[K]): Array[Byte] = r.toBytes
    def bufferEncoder: Encoder[TopFreq[K]] = Encoders.kryo[TopFreq[K]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union-merge of exported heavy-hitter shards → merged bytes
    * (re-shard / compact a heavy-hitter sketch table). */
  final class TopFreqMergeBytesAgg[K](n: Int, depth: Int, width: Int)
      (implicit kc: KeyCodec[K])
      extends Aggregator[Array[Byte], TopFreq[K], Array[Byte]] {
    def zero: TopFreq[K] = new TopFreq[K](n, depth, width)
    def reduce(buf: TopFreq[K], in: Array[Byte]): TopFreq[K] = {
      require(in != null, "null sketch bytes (outer-join-produced shard?)")
      buf.mergeCanonical(TopFreq.fromBytes[K](in))
    }
    def merge(a: TopFreq[K], b: TopFreq[K]): TopFreq[K] = a.mergeCanonical(b)
    def finish(r: TopFreq[K]): Array[Byte] = r.toBytes
    def bufferEncoder: Encoder[TopFreq[K]] = Encoders.kryo[TopFreq[K]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union-merge of exported heavy-hitter shards → the ranked top-n
    * (query side of the heavy-hitter sketch table; raw data never
    * re-read). */
  final class TopFreqMergeTopNAgg[K](n: Int, depth: Int, width: Int)
      (implicit kc: KeyCodec[K], outEnc: Encoder[Seq[(K, Long)]])
      extends Aggregator[Array[Byte], TopFreq[K], Seq[(K, Long)]] {
    def zero: TopFreq[K] = new TopFreq[K](n, depth, width)
    def reduce(buf: TopFreq[K], in: Array[Byte]): TopFreq[K] = {
      require(in != null, "null sketch bytes (outer-join-produced shard?)")
      buf.mergeCanonical(TopFreq.fromBytes[K](in))
    }
    def merge(a: TopFreq[K], b: TopFreq[K]): TopFreq[K] = a.mergeCanonical(b)
    def finish(r: TopFreq[K]): Seq[(K, Long)] = r.topN
    def bufferEncoder: Encoder[TopFreq[K]] = Encoders.kryo[TopFreq[K]]
    def outputEncoder: Encoder[Seq[(K, Long)]] = outEnc
  }

  /** most_distinct(n, p, tol, err): top-n keys by approx COUNT(DISTINCT v). */
  final class MostDistinct[IN, K](n: Int, probability: Double, tolerance: Double,
      errorRate: Double, key: IN => K, value: IN => Any)
      (implicit outEnc: Encoder[Seq[(K, Long)]])
      extends Aggregator[IN, TopDistinct[K], Seq[(K, Long)]] {
    def zero: TopDistinct[K] = TopDistinct[K](n, probability, tolerance, errorRate)
    def reduce(buf: TopDistinct[K], in: IN): TopDistinct[K] = buf.push(key(in), value(in))
    def merge(a: TopDistinct[K], b: TopDistinct[K]): TopDistinct[K] = a.merge(b)
    def finish(r: TopDistinct[K]): Seq[(K, Long)] = r.topN
    def bufferEncoder: Encoder[TopDistinct[K]] = Encoders.kryo[TopDistinct[K]]
    def outputEncoder: Encoder[Seq[(K, Long)]] = outEnc
  }

  /** [[MostDistinct]]'s explicit-shape build finishing to the
    * byte-stable export ([[graft.sketch.TopDistinct.toBytes]]) — the
    * top-keys-by-distinct-count state as a persistable artifact (sk27
    * has DuckDB rebuild the whole thing: every tracked key's HLL
    * registers AND every HLL-valued CMS cell). */
  final class TopDistinctBytesAgg[IN, K](n: Int, depth: Int, width: Int,
      hllB: Int, key: IN => K, value: IN => Any)(implicit kc: KeyCodec[K])
      extends Aggregator[IN, TopDistinct[K], Array[Byte]] {
    def zero: TopDistinct[K] = new TopDistinct[K](n, depth, width, hllB)
    def reduce(buf: TopDistinct[K], in: IN): TopDistinct[K] =
      buf.push(key(in), value(in))
    def merge(a: TopDistinct[K], b: TopDistinct[K]): TopDistinct[K] = a.merge(b)
    def finish(r: TopDistinct[K]): Array[Byte] = r.toBytes
    def bufferEncoder: Encoder[TopDistinct[K]] = Encoders.kryo[TopDistinct[K]]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** approx_quantiles(eps, qs): deterministic GK quantile summary —
    * every returned value within ±εN rank of its target at ANY
    * partition count (merge is uncertainty-additive over the combined
    * count; the sk28 gate asserts the bound under Spark's real
    * partial-merge tree, SketchSpec under adversarial orders). */
  final class ApproxQuantiles[IN](eps: Double, qs: Seq[Double],
      value: IN => Double)(implicit outEnc: Encoder[Seq[Double]])
      extends Aggregator[IN, GkQuantile, Seq[Double]] {
    def zero: GkQuantile = new GkQuantile(eps)
    def reduce(b: GkQuantile, in: IN): GkQuantile = b.add(value(in))
    def merge(a: GkQuantile, b: GkQuantile): GkQuantile = a.merge(b)
    // empty input: an empty Seq, not a crash (approx_percentile returns
    // null here; SampleUnstable returns Seq.empty — same discipline)
    def finish(r: GkQuantile): Seq[Double] =
      if (r.count == 0) Seq.empty else qs.map(r.query)
    def bufferEncoder: Encoder[GkQuantile] = Encoders.kryo[GkQuantile]
    def outputEncoder: Encoder[Seq[Double]] = outEnc
  }

  /** sample_unstable(k): exact-k mergeable uniform reservoir. */
  final class SampleUnstable[T](k: Int, seed: Long)(implicit outEnc: Encoder[Seq[T]])
      extends Aggregator[T, Reservoir[T], Seq[T]] {
    def zero: Reservoir[T] = new Reservoir[T](k, seed)
    def reduce(buf: Reservoir[T], in: T): Reservoir[T] = buf.add(in)
    def merge(a: Reservoir[T], b: Reservoir[T]): Reservoir[T] = a.merge(b)
    def finish(r: Reservoir[T]): Seq[T] = r.items.toSeq
    def bufferEncoder: Encoder[Reservoir[T]] = Encoders.kryo[Reservoir[T]]
    def outputEncoder: Encoder[Seq[T]] = outEnc
  }

  /** sort_n_by(n, cmp): bounded top-n, usable inside groupBy. */
  final class SortNBy[T](n: Int, ord: Ordering[T])(implicit outEnc: Encoder[Seq[T]])
      extends Aggregator[T, BoundedSort[T], Seq[T]] {
    def zero: BoundedSort[T] = new BoundedSort[T](n, ord)
    def reduce(buf: BoundedSort[T], in: T): BoundedSort[T] = buf.add(in)
    def merge(a: BoundedSort[T], b: BoundedSort[T]): BoundedSort[T] = a.merge(b)
    def finish(r: BoundedSort[T]): Seq[T] = r.sorted
    def bufferEncoder: Encoder[BoundedSort[T]] = Encoders.kryo[BoundedSort[T]]
    def outputEncoder: Encoder[Seq[T]] = outEnc
  }

  /** Kahan-compensated streaming mean — the reference's `mean` sink
    * (par_sink/mean.rs:38-91): exact count-weighted merge of partials. */
  final case class MeanState(sum: Double, correction: Double, count: Long)
  final class KahanMean[IN](f: IN => Double)
      extends Aggregator[IN, MeanState, Double] {
    def zero: MeanState = MeanState(0.0, 0.0, 0L)
    def reduce(s: MeanState, in: IN): MeanState = {
      val y = f(in) - s.correction
      val t = s.sum + y
      MeanState(t, (t - s.sum) - y, s.count + 1)
    }
    def merge(a: MeanState, b: MeanState): MeanState =
      MeanState(a.sum + b.sum, a.correction + b.correction, a.count + b.count)
    def finish(s: MeanState): Double =
      if (s.count == 0) Double.NaN else (s.sum - s.correction) / s.count
    def bufferEncoder: Encoder[MeanState] = Encoders.product[MeanState]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Kahan-compensated streaming sum — the reference's `sum` sink
    * (par_sink/sum.rs) with mean.rs's compensation. */
  final class KahanSum[IN](f: IN => Double)
      extends Aggregator[IN, MeanState, Double] {
    def zero: MeanState = MeanState(0.0, 0.0, 0L)
    def reduce(s: MeanState, in: IN): MeanState = {
      val y = f(in) - s.correction
      val t = s.sum + y
      MeanState(t, (t - s.sum) - y, s.count + 1)
    }
    def merge(a: MeanState, b: MeanState): MeanState =
      MeanState(a.sum + b.sum, a.correction + b.correction, a.count + b.count)
    def finish(s: MeanState): Double = s.sum - s.correction
    def bufferEncoder: Encoder[MeanState] = Encoders.product[MeanState]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** count sink (par_sink/count.rs). */
  final class CountAll[IN] extends Aggregator[IN, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, in: IN): Long = b + 1
    def merge(a: Long, b: Long): Long = a + b
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Welford streaming population stddev with pairwise variance merge —
    * the reference's `stddev` sink (par_sink/stddev.rs:38-95). */
  final case class VarState(count: Long, mean: Double, m2: Double)
  final class WelfordStddev[IN](f: IN => Double)
      extends Aggregator[IN, VarState, Double] {
    def zero: VarState = VarState(0L, 0.0, 0.0)
    def reduce(s: VarState, in: IN): VarState = {
      val x = f(in)
      val n = s.count + 1
      val d = x - s.mean
      val mean = s.mean + d / n
      VarState(n, mean, s.m2 + d * (x - mean))
    }
    def merge(a: VarState, b: VarState): VarState = {
      if (a.count == 0) b
      else if (b.count == 0) a
      else {
        val n = a.count + b.count
        val d = b.mean - a.mean
        VarState(n,
          a.mean + d * b.count / n,
          a.m2 + b.m2 + d * d * a.count * b.count / n)
      }
    }
    def finish(s: VarState): Double =
      if (s.count == 0) Double.NaN else math.sqrt(s.m2 / s.count)
    def bufferEncoder: Encoder[VarState] = Encoders.product[VarState]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  // ---- combinators: the reference's "arbitrary sink nested under
  // group_by" (par_sink/group_by.rs) = composable Aggregators -----------

  /** Prepend a transform to an aggregator's input — the reference's
    * `Pipe` sink composition (par_sink/pipe.rs). */
  def contramap[A, IN, B, O](f: A => IN, agg: Aggregator[IN, B, O]): Aggregator[A, B, O] =
    new Aggregator[A, B, O] {
      def zero: B = agg.zero
      def reduce(b: B, a: A): B = agg.reduce(b, f(a))
      def merge(x: B, y: B): B = agg.merge(x, y)
      def finish(b: B): O = agg.finish(b)
      def bufferEncoder: Encoder[B] = agg.bufferEncoder
      def outputEncoder: Encoder[O] = agg.outputEncoder
    }

  /** Run two aggregators over one pass — the reference's `fork` / tuple
    * sinks (par_sink/fork.rs, tuple.rs). */
  def zip2[IN, B1, O1, B2, O2](a1: Aggregator[IN, B1, O1], a2: Aggregator[IN, B2, O2])
      (implicit outEnc: Encoder[(O1, O2)]): Aggregator[IN, (B1, B2), (O1, O2)] =
    new Aggregator[IN, (B1, B2), (O1, O2)] {
      def zero: (B1, B2) = (a1.zero, a2.zero)
      def reduce(b: (B1, B2), in: IN): (B1, B2) =
        (a1.reduce(b._1, in), a2.reduce(b._2, in))
      def merge(x: (B1, B2), y: (B1, B2)): (B1, B2) =
        (a1.merge(x._1, y._1), a2.merge(x._2, y._2))
      def finish(b: (B1, B2)): (O1, O2) = (a1.finish(b._1), a2.finish(b._2))
      def bufferEncoder: Encoder[(B1, B2)] = Encoders.kryo[(B1, B2)]
      def outputEncoder: Encoder[(O1, O2)] = outEnc
    }
}
