package graft.operators

import graft.aggregators.SketchAggregators._
import graft.sketch.BoundedSort
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed façade over `Dataset[T]` exposing the reference's stream verb
  * surface (amadeus `ParallelStream`/`DistributedStream`,
  * /root/reference/amadeus-core/src/par_stream.rs).
  *
  * Design: every verb delegates to a declarative Dataset operation so the
  * plan stays inside Catalyst (fusion, partial aggregation, AQE). Terminal
  * sinks that the reference implements as ReduceA/B/C reducer trees map to
  * Spark aggregates — which ARE a partial/merge/final tree — or to our
  * sketch Aggregators. Nothing here collects to the driver except the
  * terminal results themselves.
  *
  * Gradual typing (reference `Value` ⇄ `#[derive(Data)]`,
  * amadeus-types/src/value.rs): `GraftStream.dynamic` wraps a DataFrame;
  * `DynStream.downcast[T]` ≅ `value.downcast::<T>()`; `.upcast` ≅ static →
  * dynamic (always succeeds).
  */
final case class GraftStream[T](ds: Dataset[T]) {

  private def spark: SparkSession = ds.sparkSession

  // ---- narrow transformations (par_stream.rs §2.2) --------------------

  /** par_stream.rs:79-85 */
  def map[B: Encoder](f: T => B): GraftStream[B] = GraftStream(ds.map(f))

  /** par_stream.rs:88-95 — f returns a collection, flattened */
  def flatMap[B: Encoder](f: T => IterableOnce[B]): GraftStream[B] =
    GraftStream(ds.flatMap(f))

  /** par_stream.rs:98-104 */
  def filter(f: T => Boolean): GraftStream[T] = GraftStream(ds.filter(f))

  /** par_stream.rs:61-67 — side-effect peek, identity on the stream */
  def inspect(f: T => Unit)(implicit e: Encoder[T]): GraftStream[T] =
    GraftStream(ds.map { t => f(t); t })

  /** par_stream.rs:70-76 — in-place mutate; JVM rows are immutable so this
    * is a map that returns the updated row */
  def update(f: T => T)(implicit e: Encoder[T]): GraftStream[T] =
    GraftStream(ds.map(f))

  /** par_stream.rs:129-135 — concatenation, bag semantics (UNION ALL) */
  def chain(other: GraftStream[T]): GraftStream[T] =
    GraftStream(ds.union(other.ds))

  /** Escape hatch: arbitrary Dataset-level pipe (≅ ParallelPipe). */
  def pipe[B](f: Dataset[T] => Dataset[B]): GraftStream[B] = GraftStream(f(ds))

  // ---- joins (broadcast-only in the reference, par_stream/join.rs) ----

  /** left_join (par_stream.rs:107-115): the right side is a driver-local
    * collection replicated to every task — exactly a broadcast variable.
    * Emits (K, V1, matches) per left row; empty matches if none. */
  def leftJoin[K, V2](right: Seq[(K, V2)])(key: T => K)
      (implicit e: Encoder[(K, T, Seq[V2])]): GraftStream[(K, T, Seq[V2])] = {
    val bc = spark.sparkContext.broadcast(right.groupMap(_._1)(_._2))
    GraftStream(ds.map { t =>
      val k = key(t)
      (k, t, bc.value.getOrElse(k, Seq.empty))
    })
  }

  /** inner_join (par_stream.rs:118-126): like leftJoin but drops
    * non-matching left rows. */
  def innerJoin[K, V2](right: Seq[(K, V2)])(key: T => K)
      (implicit e: Encoder[(K, T, Seq[V2])]): GraftStream[(K, T, Seq[V2])] = {
    val bc = spark.sparkContext.broadcast(right.groupMap(_._1)(_._2))
    GraftStream(ds.flatMap { t =>
      val k = key(t)
      bc.value.get(k).map(vs => (k, t, vs))
    })
  }

  /** Distributed cogroup (exceeds the reference's broadcast-only joins):
    * both sides shuffle ONCE on the key, then `f` sees each key with both
    * sides' full match iterators — the general (K, Iter[V1], Iter[V2])
    * shape the reference's `left_join`/`inner_join` only approximate with
    * a driver-replicated right side. Backed by
    * `KeyValueGroupedDataset.cogroup`, so each side is a single hash
    * partitioning (spillable, no driver collection at any size).
    */
  def coGroup[K: Encoder, U, R: Encoder](other: GraftStream[U])(
      keyL: T => K, keyR: U => K)(
      f: (K, Iterator[T], Iterator[U]) => IterableOnce[R]): GraftStream[R] =
    GraftStream(ds.groupByKey(keyL).cogroup(other.ds.groupByKey(keyR)) {
      (k, ls, rs) => f(k, ls, rs).iterator
    })

  // ---- terminal sinks (par_sink/*, §2.3) ------------------------------

  /** par_sink/count.rs */
  def count(): Long = ds.count()

  /** par_sink/for_each.rs */
  def forEach(f: T => Unit): Unit = ds.foreach(f)

  /** par_sink/fold.rs — generic fold with explicit partial merge; runs as
    * a two-level tree aggregate (ReduceA per partition, ReduceC final). */
  def fold[B: scala.reflect.ClassTag](zero: B)(op: (B, T) => B, merge: (B, B) => B): B =
    ds.rdd.treeAggregate(zero)(op, merge)

  /** par_sink/sum.rs */
  def sum(implicit num: Numeric[T], ct: scala.reflect.ClassTag[T]): T =
    fold(num.zero)(num.plus, num.plus)

  /** par_sink/combine.rs — reduce to Option (None on empty stream) */
  def combine(f: (T, T) => T): Option[T] =
    if (ds.isEmpty) None else Some(ds.reduce(f))

  /** par_sink/mean.rs — Kahan-compensated */
  def mean(f: T => Double): Double =
    ds.select(new KahanMean[T](f).toColumn).head()

  /** par_sink/stddev.rs — population stddev, Welford + pairwise merge */
  def stddev(f: T => Double): Double =
    ds.select(new WelfordStddev[T](f).toColumn).head()

  /** par_sink/max.rs — extrema by Ordering; None on empty */
  def max(implicit ord: Ordering[T]): Option[T] = combine(ord.max)
  def min(implicit ord: Ordering[T]): Option[T] = combine(ord.min)
  def maxBy[B](f: T => B)(implicit ord: Ordering[B]): Option[T] =
    combine((a, b) => if (ord.gteq(f(a), f(b))) a else b)
  def minBy[B](f: T => B)(implicit ord: Ordering[B]): Option[T] =
    combine((a, b) => if (ord.lteq(f(a), f(b))) a else b)

  /** par_sink/all.rs / any.rs — short-circuits via CollectLimitExec */
  def all(f: T => Boolean): Boolean = ds.filter((t: T) => !f(t)).isEmpty
  def any(f: T => Boolean): Boolean = !ds.filter(f).isEmpty

  /** par_sink/histogram.rs — exact (key, count) sorted by key.
    * Distributed groupBy+count; only the distinct-key result is collected.
    *
    * DRIVER-MEMORY CLIFF (reference parity: amadeus also returns a Vec):
    * the result is one entry PER DISTINCT KEY, so a high-cardinality key
    * at corpus scale OOMs the driver. For anything whose cardinality you
    * can't bound, use [[histogramDs]] and keep the frame distributed. */
  def histogram()(implicit ord: Ordering[T], e: Encoder[(T, Long)]): Seq[(T, Long)] = {
    histogramDs().collect().toSeq.sortBy(_._1)
  }

  /** Driver-safe histogram: the same distributed groupBy+count, NOT
    * collected — compose, write, or top-n it without driver materialization. */
  def histogramDs()(implicit e: Encoder[(T, Long)]): Dataset[(T, Long)] = {
    implicit val te: Encoder[T] = ds.encoder
    ds.groupByKey(identity).count()
  }

  /** par_stream.rs:181-191 sort_n_by — bounded top-n */
  def sortNBy(n: Int)(implicit ord: Ordering[T]): Seq[T] = {
    implicit val seqEnc: Encoder[Seq[T]] =
      org.apache.spark.sql.Encoders.kryo[Seq[T]]
    ds.select(new SortNBy[T](n, ord).toColumn).head()
  }

  /** par_stream.rs:334-348 most_frequent — approx heavy hitters */
  def mostFrequent(n: Int, probability: Double, tolerance: Double): Seq[(T, Long)] = {
    implicit val outEnc: Encoder[Seq[(T, Long)]] =
      org.apache.spark.sql.Encoders.kryo[Seq[(T, Long)]]
    ds.select(new MostFrequent[T, T](n, probability, tolerance, identity).toColumn).head()
  }

  /** par_stream.rs:351-372 most_distinct — top keys by distinct values */
  def mostDistinct[K, V](n: Int, probability: Double, tolerance: Double,
      errorRate: Double)(key: T => K, value: T => V): Seq[(K, Long)] = {
    implicit val outEnc: Encoder[Seq[(K, Long)]] =
      org.apache.spark.sql.Encoders.kryo[Seq[(K, Long)]]
    ds.select(new MostDistinct[T, K](n, probability, tolerance, errorRate,
      key, value.andThen(_.asInstanceOf[Any])).toColumn).head()
  }

  /** SampleTotal (amadeus-streaming/src/sample.rs:7-33): exactly-k
    * uniform sample WITHOUT replacement. The reference streams one pass
    * with sequential selection (Algorithm S), which is why it must be
    * told the population size up front; the Spark-first equivalent is a
    * random-permutation prefix — rank every row by a seeded random key
    * and take the k smallest — which Catalyst plans as
    * TakeOrderedAndProject: per-partition bounded top-k (narrow), driver
    * merge of partitions×k candidates, NO global sort and no prior
    * count. Statistically identical (any fixed k-subset is equally
    * likely), deterministic for a fixed seed and partition layout.
    * Exactly min(k, population) rows out. */
  def sampleTotal(k: Int, seed: Long = 42L): GraftStream[T] = {
    implicit val te: Encoder[T] = ds.encoder
    import org.apache.spark.sql.functions.{col, rand}
    val keyed = ds.toDF().withColumn("__r", rand(seed))
    GraftStream(keyed.orderBy(col("__r")).limit(k).drop("__r").as[T])
  }

  /** par_stream.rs:375-389 sample_unstable — exact-k mergeable reservoir */
  def sampleUnstable(k: Int, seed: Long = 42L): Seq[T] = {
    implicit val outEnc: Encoder[Seq[T]] =
      org.apache.spark.sql.Encoders.kryo[Seq[T]]
    ds.select(new SampleUnstable[T](k, seed).toColumn).head()
  }

  /** group_by(sub_sink) (par_sink/group_by.rs): arbitrary aggregator per
    * key — Spark's partial aggregation replaces the reference's driver-side
    * key-map merge, so the AGGREGATION scales past driver memory; the
    * collected result is still one row per key (driver cliff at
    * unbounded key cardinality — use [[groupBySinkDs]] there). */
  def groupBySink[K, B, O](key: T => K)(agg: Aggregator[T, B, O])
      (implicit ke: Encoder[K], oe: Encoder[(K, O)]): Seq[(K, O)] =
    groupBySinkDs(key)(agg).collect().toSeq

  /** Driver-safe group_by(sub_sink): distributed per-key aggregation,
    * NOT collected. */
  def groupBySinkDs[K, B, O](key: T => K)(agg: Aggregator[T, B, O])
      (implicit ke: Encoder[K], oe: Encoder[(K, O)]): Dataset[(K, O)] =
    ds.groupByKey(key).agg(agg.toColumn)

  /** fork (par_stream.rs:521-547): two sinks, ONE pass over the data. */
  def fork[B1, O1, B2, O2](a: Aggregator[T, B1, O1], b: Aggregator[T, B2, O2]): (O1, O2) = {
    implicit val outEnc: Encoder[(O1, O2)] =
      org.apache.spark.sql.Encoders.kryo[(O1, O2)]
    ds.select(zip2(a, b).toColumn).head()
  }

  /** tuple sinks (par_sink/tuple.rs, up to 8 in the reference): N
    * aggregators over one pass, by nesting zip2 */
  def fork3[B1, O1, B2, O2, B3, O3](a: Aggregator[T, B1, O1],
      b: Aggregator[T, B2, O2], c: Aggregator[T, B3, O3]): (O1, O2, O3) = {
    implicit val e1: Encoder[(O1, (O2, O3))] =
      org.apache.spark.sql.Encoders.kryo[(O1, (O2, O3))]
    implicit val e2: Encoder[(O2, O3)] =
      org.apache.spark.sql.Encoders.kryo[(O2, O3)]
    val (o1, (o2, o3)) = ds.select(zip2(a, zip2(b, c)).toColumn).head()
    (o1, o2, o3)
  }

  def fork4[B1, O1, B2, O2, B3, O3, B4, O4](a: Aggregator[T, B1, O1],
      b: Aggregator[T, B2, O2], c: Aggregator[T, B3, O3],
      d2: Aggregator[T, B4, O4]): (O1, O2, O3, O4) = {
    implicit val e1: Encoder[((O1, O2), (O3, O4))] =
      org.apache.spark.sql.Encoders.kryo[((O1, O2), (O3, O4))]
    implicit val e2: Encoder[(O1, O2)] =
      org.apache.spark.sql.Encoders.kryo[(O1, O2)]
    implicit val e3: Encoder[(O3, O4)] =
      org.apache.spark.sql.Encoders.kryo[(O3, O4)]
    val ((o1, o2), (o3, o4)) = ds.select(zip2(zip2(a, b), zip2(c, d2)).toColumn).head()
    (o1, o2, o3, o4)
  }

  /** fork with a NON-aggregate sink (par_sink/fork.rs:21-60): stream the
    * rows into a write destination AND compute aggregate sinks in the
    * SAME single pass. Spark-first mechanism: `observe` plants a
    * CollectMetrics node inside the write job, so the aggregates are
    * folded per-task as the rows flow to the files — the source is
    * read ONCE, nothing is persisted, and the returned map holds the
    * aggregate results after the write commits (ForkSpec asserts the
    * whole thing is exactly one Spark job).
    *
    * This covers the fork(sink, aggregation…) shape exactly — the
    * overwhelmingly common fork use (write + count/sum/histogram of
    * what was written). The one shape it cannot cover is
    * fork(write1, write2) with two ARBITRARY writes: a Spark action
    * drives one sink by design, so compose `persist()` + two writes —
    * cost bound: ONE extra materialization of the projected columns
    * (memory/disk-backed), strictly cheaper than a second source scan
    * whenever the projection is narrower than the source, which a
    * re-scan would pay in full. */
  def forkWrite(path: String, format: String = "parquet",
      mode: String = "overwrite")(
      metrics: org.apache.spark.sql.Column*): Map[String, Any] =
    upcast.forkWrite(path, format, mode)(metrics: _*)

  /** par_sink/collect.rs */
  def collect(): Seq[T] = ds.collect().toSeq

  /** static → dynamic (always succeeds; ≅ T → Value upcast) */
  def upcast: DynStream = DynStream(ds.toDF())
}

/** Dynamic (self-describing rows) side of the reference's gradual typing:
  * DataFrame ≅ stream of `Value` (amadeus-types/src/value.rs:91-157). */
final case class DynStream(df: DataFrame) {
  /** dynamic → static downcast, ≅ `value.downcast::<T>()`
    * (amadeus-types/src/lib.rs:114-146); fails analysis if incompatible. */
  def downcast[T: Encoder]: GraftStream[T] = GraftStream(df.as[T])
  def filter(cond: org.apache.spark.sql.Column): DynStream = DynStream(df.filter(cond))
  def select(cols: org.apache.spark.sql.Column*): DynStream = DynStream(df.select(cols: _*))
  def count(): Long = df.count()

  /** fork(write, aggregations…) in ONE pass — see
    * [[GraftStream.forkWrite]] for the full contract. CollectMetrics
    * (`observe`) folds the aggregates per-task inside the write job;
    * the map holds their values once the write commits. */
  def forkWrite(path: String, format: String = "parquet",
      mode: String = "overwrite")(
      metrics: org.apache.spark.sql.Column*): Map[String, Any] = {
    require(metrics.nonEmpty, "forkWrite needs at least one aggregate metric")
    val obs = new org.apache.spark.sql.Observation()
    df.observe(obs, metrics.head, metrics.tail: _*)
      .write.format(format).mode(mode).save(path)
    obs.get
  }

  /** `Group::get(name)` (amadeus-types group.rs:43-48): field access by
    * name, dotted for nesting ("a.b.c"); analysis error if absent —
    * mirroring the reference's Option-returning lookup at plan time. */
  def get(name: String): org.apache.spark.sql.Column = df.col(name)

  /** field access by ordinal (Group's index-by-position) */
  def getAt(i: Int): org.apache.spark.sql.Column = df.col(df.columns(i))

  /** field names in order (Group's name→ordinal map) */
  def fieldNames: Seq[String] = df.columns.toSeq

  // ---- Value::as_* downcast family ------------------------------------
  // (amadeus-types/src/value.rs:449-1200). Column-level checked
  // downcasts: with ANSI off (GraftSession), an incoercible value casts
  // to NULL — the faithful Spark mapping of the reference's
  // Option-returning `as_*`; the `into_*` consuming twins have no JVM
  // meaning (no move semantics) and collapse onto these. Unsigned types
  // land in the one-size-wider signed type, matching
  // [[graft.sources.SchemaMapper]] so every downcast round-trips through
  // parquet/CSV/JDBC unchanged.
  private def as(name: String, t: String) = get(name).cast(t)
  def asBool(name: String): org.apache.spark.sql.Column = as(name, "boolean")
  def asI8(name: String): org.apache.spark.sql.Column = as(name, "tinyint")
  def asI16(name: String): org.apache.spark.sql.Column = as(name, "smallint")
  def asI32(name: String): org.apache.spark.sql.Column = as(name, "int")
  def asI64(name: String): org.apache.spark.sql.Column = as(name, "bigint")
  def asU8(name: String): org.apache.spark.sql.Column = as(name, "smallint")
  def asU16(name: String): org.apache.spark.sql.Column = as(name, "int")
  def asU32(name: String): org.apache.spark.sql.Column = as(name, "bigint")
  def asU64(name: String): org.apache.spark.sql.Column = as(name, "decimal(20,0)")
  def asF32(name: String): org.apache.spark.sql.Column = as(name, "float")
  def asF64(name: String): org.apache.spark.sql.Column = as(name, "double")
  def asDecimal(name: String, precision: Int = 38, scale: Int = 18): org.apache.spark.sql.Column =
    as(name, s"decimal($precision,$scale)")
  def asString(name: String): org.apache.spark.sql.Column = as(name, "string")
  def asBytes(name: String): org.apache.spark.sql.Column = as(name, "binary")
  def asDate(name: String): org.apache.spark.sql.Column = as(name, "date")
  /** μs from midnight (the reference's Time has no Spark native type) */
  def asTime(name: String): org.apache.spark.sql.Column = as(name, "bigint")
  def asTimestamp(name: String): org.apache.spark.sql.Column = as(name, "timestamp")
  def asTimestampNtz(name: String): org.apache.spark.sql.Column = as(name, "timestamp_ntz")
  /** Value::Json passthrough + pointer extraction (`as_json`) */
  def asJson(name: String, path: String = "$"): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.get_json_object(asString(name), path)
  /** enum ≅ its string discriminant */
  def asEnum(name: String): org.apache.spark.sql.Column = asString(name)
  def asUrl(name: String): org.apache.spark.sql.Column = asString(name)
  def asIpAddr(name: String): org.apache.spark.sql.Column = asString(name)
  /** as_list / as_group: structural — the column already IS the
    * composite; element/field access composes via getItem/getField */
  def asList(name: String): org.apache.spark.sql.Column = get(name)
  def asGroup(name: String): org.apache.spark.sql.Column = get(name)
  /** Option::Some unwrap ≅ null-filter + value */
  def asSome(name: String): DynStream = DynStream(df.filter(get(name).isNotNull))
}

object GraftStream {
  /** in-memory collections → stream (into_par_stream/collections.rs) */
  def fromSeq[T: Encoder](spark: SparkSession, seq: Seq[T]): GraftStream[T] =
    GraftStream(spark.createDataset(seq))

  /** Range source */
  def range(spark: SparkSession, start: Long, end: Long): GraftStream[Long] = {
    import spark.implicits._
    GraftStream(spark.range(start, end).as[Long])
  }

  /** typed CSV source (amadeus-serde csv.rs: headerless, schema-first) */
  def csv[T: Encoder](spark: SparkSession, path: String, header: Boolean = false): GraftStream[T] =
    GraftStream(spark.read
      .schema(implicitly[Encoder[T]].schema)
      .option("header", header.toString).csv(path).as[T])

  /** typed newline-JSON source (amadeus-serde json.rs) */
  def json[T: Encoder](spark: SparkSession, path: String): GraftStream[T] =
    GraftStream(spark.read.schema(implicitly[Encoder[T]].schema).json(path).as[T])

  /** typed Parquet source (amadeus-parquet) — schema pruning pushes the
    * typed row's columns down to the scan */
  def parquet[T: Encoder](spark: SparkSession, path: String): GraftStream[T] =
    GraftStream(spark.read.parquet(path).as[T])

  /** dynamic (Value-typed) sources */
  def dynamicParquet(spark: SparkSession, path: String): DynStream =
    DynStream(spark.read.parquet(path))
  def dynamicCsv(spark: SparkSession, path: String, header: Boolean = false): DynStream =
    DynStream(spark.read.option("header", header.toString)
      .option("inferSchema", "true").csv(path))
  def dynamicJson(spark: SparkSession, path: String): DynStream =
    DynStream(spark.read.json(path))
}
