package graft.operators

import graft.aggregators.SketchAggregators.HllSketchAgg
import graft.sketch.HyperLogLog
import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Materialized-sketch views: pre-aggregate a fixed-size sketch per time
  * bucket ONCE, then answer window queries by MERGING sketches instead of
  * rescanning events — the pattern that turns "distinct users in any
  * 6-hour window" from a per-query corpus scan into an O(buckets) merge
  * over kilobyte state. HLL union is register-wise max (associative,
  * commutative, idempotent), so merged estimates are exactly the sketch
  * of the unioned raw data — the algebra is lossless by construction.
  *
  * At 100 TB: the ONLY corpus-sized pass is the per-bucket sketch build
  * (one map-side-combined aggregate); everything after moves
  * 2^b-byte sketches keyed by bucket. The hourly sketch table is the
  * thing you'd persist and maintain incrementally (see
  * [[graft.streaming.EventStreams.incrementalAggStreamed]] for the
  * refresh shape — HLL buffers merge the same way grouped sums do).
  */
object SketchViews {

  /** Register-array round-trip for a parquet-backed sketch store: the
    * serialized form IS the registers (b = log2(length)), engine- and
    * version-stable — the same property the SketchSpec Kryo golden pins.
    * Merging two byte forms is pointwise max, no deserialization needed
    * conceptually; we go through [[HyperLogLog]] for the single
    * implementation of the law. */
  /** ONE serialized sketch format repo-wide: the versioned byte-stable
    * export ([[HyperLogLog.toBytes]], `[1, b, registers]`) that sk20
    * proves an external engine can rebuild byte-for-byte — a sketch
    * store written by the streaming view is directly consumable by the
    * sk21 sketch-table rollup aggregators and by foreign readers. */
  def sketchToBytes(h: HyperLogLog): Array[Byte] = h.toBytes

  def sketchFromBytes(bytes: Array[Byte]): HyperLogLog =
    HyperLogLog.fromBytes(bytes)

  /** Approximate distinct `idCol` per sliding window of `windowHours`
    * hour buckets, via hourly HLL sketches merged per window position.
    * A window is identified by its LAST hour bucket (`window_end_h`,
    * epoch micros); every position reachable from an occupied hour is
    * emitted, so trailing windows cover partial data by design.
    */
  def slidingDistinct(events: DataFrame, tsCol: String, idCol: String,
      windowHours: Int, b: Int = 12): DataFrame = {
    require(windowHours >= 1, s"windowHours=$windowHours must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    implicit val hllEnc: Encoder[HyperLogLog] = Encoders.kryo[HyperLogLog]
    implicit val posEnc: Encoder[(Long, HyperLogLog)] =
      Encoders.tuple(Encoders.scalaLong, hllEnc)
    implicit val redEnc: Encoder[(Long, (Long, HyperLogLog))] =
      Encoders.tuple(Encoders.scalaLong, posEnc)
    val hourly = events
      .select(unix_micros(date_trunc("hour", col(tsCol))).as("h"),
        col(idCol).cast("long").as("id"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .agg(new HllSketchAgg[(Long, Long)](b, _._2).toColumn.name("sk"))
    val hourUs = 3600000000L
    val contrib = hourly.flatMap { case (h, sk) =>
      (0 until windowHours).map(k => (h + k * hourUs, sk))
    }
    contrib.groupByKey(_._1)
      .reduceGroups((a, c) => (a._1, a._2.merge(c._2)))
      .map { case (pos, (_, sk)) => (pos, sk.cardinality) }
      .toDF("window_end_h", "approx_distinct")
  }
}
