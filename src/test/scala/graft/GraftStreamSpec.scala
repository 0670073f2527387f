package graft

import graft.operators.{DynStream, GraftStream}
import graft.aggregators.SketchAggregators._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Façade verb coverage vs in-memory Scala-collection truth — the shape of
  * the reference's tests/into_par_stream.rs + typed/untyped duality tests
  * (tests/csv.rs:14-58). */
class GraftStreamSpec extends AnyFunSuite with CacheHygiene {

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  import spark.implicits._

  def ints: GraftStream[Long] = GraftStream.range(spark, 0, 1000)

  test("map / filter / flatMap / chain against collection truth") {
    assert(ints.map(_ * 2).sum == (0L until 1000L).map(_ * 2).sum)
    assert(ints.filter(_ % 3 == 0).count() == (0L until 1000L).count(_ % 3 == 0))
    assert(ints.flatMap(x => Seq(x, -x)).count() == 2000)
    assert(ints.chain(ints).count() == 2000)
    assert(ints.update(_ + 1).min.get == 1L)
  }

  test("fold / sum / combine / mean / stddev / max / min") {
    val xs = (0L until 1000L)
    assert(ints.fold(0L)(_ + _, _ + _) == xs.sum)
    assert(ints.sum == xs.sum)
    assert(ints.combine(_ + _).get == xs.sum)
    assert(math.abs(ints.mean(_.toDouble) - 499.5) < 1e-9)
    val mean = 499.5
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / 1000)
    assert(math.abs(ints.stddev(_.toDouble) - sd) < 1e-9)
    assert(ints.max.get == 999L && ints.min.get == 0L)
    assert(ints.maxBy(x => -x).get == 0L)
    assert(ints.minBy(x => -x).get == 999L)
    assert(GraftStream.fromSeq[Long](spark, Seq.empty).combine(_ + _).isEmpty)
  }

  test("all / any short-circuit semantics") {
    assert(ints.all(_ >= 0))
    assert(!ints.all(_ < 999))
    assert(ints.any(_ == 500))
    assert(!ints.any(_ > 5000))
  }

  test("histogram matches exact groupBy count") {
    val h = ints.map(_ % 5).histogram()
    assert(h == Seq(0L -> 200L, 1L -> 200L, 2L -> 200L, 3L -> 200L, 4L -> 200L))
  }

  test("histogramDs / groupBySinkDs stay distributed (no driver collect in plan)") {
    // the Ds variants return un-collected frames: composing a further
    // distributed op (filter + count) must work without materializing
    // per-key rows on the driver, and the plan is a plain partial+final
    // aggregate with no CollectLimit/local relation
    val hDs = ints.map(_ % 5).histogramDs()
    assert(hDs.isInstanceOf[org.apache.spark.sql.Dataset[_]])
    val plan = hDs.queryExecution.executedPlan.toString
    assert(!plan.contains("CollectLimit"), s"driver-side limit in plan:\n$plan")
    assert(hDs.filter(_._2 > 0L).count() == 5L)
    assert(hDs.collect().toMap == ints.map(_ % 5).histogram().toMap)
    val gDs = ints.groupBySinkDs(_ % 3)(new CountAll[Long]())
    assert(gDs.count() == 3L)
    assert(gDs.collect().toMap == ints.groupBySink(_ % 3)(new CountAll[Long]()).toMap)
  }

  test("sortNBy / mostFrequent / sampleUnstable terminal sketches") {
    assert(ints.sortNBy(5) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(ints.sortNBy(3)(Ordering[Long].reverse) == Seq(999L, 998L, 997L))
    val mf = ints.map(_ % 4).mostFrequent(10, 0.99, 0.002)
    assert(mf.toMap == Map(0L -> 250L, 1L -> 250L, 2L -> 250L, 3L -> 250L))
    val sample = ints.sampleUnstable(25)
    assert(sample.length == 25 && sample.distinct.length == 25)
  }

  test("sampleTotal: exactly k, no replacement, deterministic, roughly uniform") {
    val s = ints.sampleTotal(100, seed = 7L).collect()
    assert(s.length == 100 && s.distinct.length == 100)
    assert(s.forall(v => v >= 0 && v < 1000))
    // deterministic under a fixed seed + layout
    assert(ints.sampleTotal(100, seed = 7L).collect() == s)
    // different seed -> (almost surely) different subset
    assert(ints.sampleTotal(100, seed = 8L).collect().toSet != s.toSet)
    // k >= population degrades to the whole population
    assert(ints.sampleTotal(5000).collect().sorted == (0L until 1000L))
    // rough uniformity: mean of a 100-of-1000 uniform draw has sd ~29;
    // 5 sigma around 499.5
    val mean = s.sum.toDouble / s.length
    assert(math.abs(mean - 499.5) < 145, s"suspicious sample mean $mean")
  }

  test("mostDistinct ranks by distinct count") {
    // key k has (k+1)*50 distinct values
    val data = for (k <- 0 until 4; v <- 0 until (k + 1) * 50) yield (s"k$k", s"v$k-$v")
    val st = GraftStream.fromSeq(spark, data)
    val ranked = st.mostDistinct(4, 0.99, 0.002, 0.05)(_._1, _._2).map(_._1)
    assert(ranked == Seq("k3", "k2", "k1", "k0"))
  }

  test("broadcast joins: reference emission shapes") {
    val left = GraftStream.fromSeq(spark, Seq((1, "a"), (2, "b"), (3, "c")))
    val dim = Seq(1 -> "one", 1 -> "uno", 2 -> "two")
    val lj = left.leftJoin(dim)(_._1).collect().sortBy(_._2._1)
    assert(lj == Seq(
      (1, (1, "a"), Seq("one", "uno")),
      (2, (2, "b"), Seq("two")),
      (3, (3, "c"), Seq.empty)))
    val ij = left.innerJoin(dim)(_._1).collect().sortBy(_._2._1)
    assert(ij.map(_._1) == Seq(1, 2))
  }

  test("groupBySink: arbitrary aggregator nested under group_by") {
    val st = GraftStream.fromSeq(spark, Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)))
    val got = st.groupBySink(_._1)(
      contramap((t: (String, Double)) => t._2, new KahanSum[Double](identity)))
      .sortBy(_._1)
    assert(got == Seq("a" -> 3.0, "b" -> 5.0))
  }

  test("fork: two sinks in one pass") {
    val st = GraftStream.range(spark, 1, 101)
    val (n, s) = st.fork(
      new CountAll[Long](),
      contramap((x: Long) => x.toDouble, new KahanSum[Double](identity)))
    assert(n == 100L && s == 5050.0)
  }

  test("fork3/fork4: tuple sinks in one pass") {
    val st = GraftStream.range(spark, 1, 101)
    val sum = contramap((x: Long) => x.toDouble, new KahanSum[Double](identity))
    val mean = contramap((x: Long) => x.toDouble, new KahanMean[Double](identity))
    val (n3, s3, m3) = st.fork3(new CountAll[Long](), sum, mean)
    assert(n3 == 100L && s3 == 5050.0 && m3 == 50.5)
    val (n4, s4, m4, sd4) = st.fork4(new CountAll[Long](), sum, mean,
      contramap((x: Long) => x.toDouble, new WelfordStddev[Double](identity)))
    assert(n4 == 100L && s4 == 5050.0 && m4 == 50.5 && math.abs(sd4 - 28.86607) < 1e-4)
  }

  test("forkWrite: write sink + aggregate sinks in exactly ONE Spark job") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import org.apache.spark.sql.functions.{col, count, lit, sum}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    val dir = "target/qtmp/spec/fork_write"
    val df = spark.range(0, 10000).selectExpr("id", "id % 7 AS v")
    // one warm write so FileFormatWriter/committer classloading jobs (if
    // any) don't pollute the counted run
    DynStream(df).forkWrite(dir)(count(lit(1)).as("n"))
    spark.sparkContext.addSparkListener(listener)
    try {
      val m = DynStream(df).forkWrite(dir)(
        count(lit(1)).as("n"), sum(col("v")).as("s"))
      // the aggregate fork saw every row of the same pass
      assert(m("n") == 10000L)
      assert(m("s") == (0L until 10000L).map(_ % 7).sum)
      // listener events are delivered async; wait for the first, then a
      // settle window so a hypothetical second job would be seen too
      val deadline = System.nanoTime() + 5e9.toLong
      while (jobs.get() < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      Thread.sleep(500)
      assert(jobs.get() == 1,
        s"forkWrite must be a single job (persist-free single pass), saw ${jobs.get()}")
      // and the write fork wrote every row
      assert(spark.read.parquet(dir).count() == 10000L)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("gradual typing: upcast/downcast round-trip (tests/csv.rs:44-58 shape)") {
    val typed = GraftStream.fromSeq(spark, Seq((1L, "x"), (2L, "y")))
    val dyn: DynStream = typed.upcast
    assert(dyn.count() == 2)
    val back = dyn.downcast[(Long, String)]
    assert(back.collect().sortBy(_._1) == Seq((1L, "x"), (2L, "y")))
  }

  test("DynStream Group::get by name/ordinal, nested dotted access") {
    val dyn = GraftStream.fromSeq(spark,
      Seq((1L, ("inner", 42)), (2L, ("other", 7)))).upcast
    assert(dyn.fieldNames == Seq("_1", "_2"))
    val v = dyn.df.select(dyn.get("_2._2")).as[Int].collect().sorted.toSeq
    assert(v == Seq(7, 42))
    assert(dyn.df.select(dyn.getAt(0)).as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    intercept[org.apache.spark.sql.AnalysisException] { dyn.get("missing") }
  }

  test("DynStream Value::as_* downcasts: widening, null-on-mismatch, json, option") {
    val dyn = GraftStream.fromSeq(spark, Seq(
      ("42", 7L, 3.5, """{"k":1}""", Option("x")),
      ("not-a-number", 300L, -1.25, """{"k":2}""", None))).upcast
    // numeric downcasts: coercible strings convert, junk -> NULL (= None)
    val i32 = dyn.df.select(dyn.asI32("_1")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getInt(0)))
    assert(i32.toSet == Set(Some(42), None))
    // u8 widens to short: 300 survives (stored widened, like SchemaMapper)
    assert(dyn.df.select(dyn.asU8("_2")).collect().map(_.getShort(0)).toSet ==
      Set(7.toShort, 300.toShort))
    assert(dyn.df.select(dyn.asU64("_2")).schema.head.dataType ==
      org.apache.spark.sql.types.DecimalType(20, 0))
    assert(dyn.df.select(dyn.asF32("_3")).collect().map(_.getFloat(0)).toSet ==
      Set(3.5f, -1.25f))
    // as_json pointer extraction
    assert(dyn.df.select(dyn.asJson("_4", "$.k")).collect()
      .map(_.getString(0)).toSet == Set("1", "2"))
    // Option unwrap: null-filter semantics
    assert(dyn.asSome("_5").count() == 1)
    // bool downcast of junk -> null, not an error (ANSI off)
    assert(dyn.df.select(dyn.asBool("_1")).collect().count(_.isNullAt(0)) == 2)
  }

  test("typed csv/json round-trip via GraftStream sources") {
    val dir = "target/qtmp/stream_rt"
    val data = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
    spark.createDataset(data).write.mode("overwrite").csv(dir + "/csv")
    spark.createDataset(data).write.mode("overwrite").json(dir + "/json")
    assert(GraftStream.csv[(Long, String, Double)](spark, dir + "/csv")
      .collect().sortBy(_._1) == data)
    assert(GraftStream.json[(Long, String, Double)](spark, dir + "/json")
      .collect().sortBy(_._1) == data)
    // dynamic read + downcast agreement (typed/untyped duality)
    assert(GraftStream.dynamicCsv(spark, dir + "/csv").count() == 3)
  }

  test("results are partition-count independent (dist mirror)") {
    val a = GraftStream(ints.ds.repartition(1))
    val b = GraftStream(ints.ds.repartition(16))
    assert(a.sum == b.sum)
    assert(a.map(_ % 7).histogram() == b.map(_ % 7).histogram())
    assert(a.sortNBy(10) == b.sortNBy(10))
    assert(a.mean(_.toDouble) == b.mean(_.toDouble))
  }

  test("coGroup: per-key reconcile matches collection groupBy truth") {
    val left = GraftStream(spark.createDataset((0L until 100L).map(k => (k % 10, k))))
    val right = GraftStream(spark.createDataset((0L until 40L).map(k => (k % 20, k * 2))))
    val got = left.coGroup(right)(_._1, _._1) { (k, ls, rs) =>
      // the match iterators are single-pass: materialize once, then derive
      val lv = ls.map(_._2).toSeq; val rv = rs.map(_._2).toSeq
      Iterator((k, lv.sum, rv.sum, lv.size))
    }.ds.collect().sortBy(_._1)
    // collection truth: keys from EITHER side appear exactly once
    val lm = (0L until 100L).map(k => (k % 10, k)).groupMap(_._1)(_._2)
    val rm = (0L until 40L).map(k => (k % 20, k * 2)).groupMap(_._1)(_._2)
    val want = (lm.keySet ++ rm.keySet).toSeq.sorted.map { k =>
      (k, lm.getOrElse(k, Nil).sum, rm.getOrElse(k, Nil).sum,
        lm.getOrElse(k, Nil).size)
    }
    assert(got.toSeq == want)
  }
}
