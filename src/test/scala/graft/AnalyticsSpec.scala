package graft

import graft.operators.Analytics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Time-series / snapshot analytics: hand-computed EWMA values, gap-fill
  * grid + forward-fill laws, z-score flagging, SCD2 version chaining,
  * snapshot-diff classification (incl. null compare values). */
class AnalyticsSpec extends AnyFunSuite with CacheHygiene {

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ewmaWindowed: hand-computed values, window truncation, both modes") {
    val df = Seq((1L, 1, 1.0), (1L, 2, 2.0), (1L, 3, 3.0))
      .toDF("k", "seq", "x")
    for (quant <- Seq(false, true)) {
      val got = Analytics.ewmaWindowed(df, Seq("k"), Seq("seq"), "x",
          alpha = 0.5, win = 2, quantized = quant)
        .orderBy("seq").select("ewma").as[Double].collect()
      // m=1: 1.0 ; m=2: (1*0.5+2)/1.5 ; win truncates row 3 to vals [2,3]
      val want = Seq(1.0, 2.5 / 1.5, 4.0 / 1.5)
      got.zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 2e-4, s"quant=$quant got=${got.toSeq}")
      }
    }
  }

  test("ewmaWindowed: quantized tracks natural mode within 2e-4") {
    val df = (1 to 200).map(i => (i % 5L, i, (i * 37 % 101) / 7.0))
      .toDF("k", "seq", "x")
    val nat = Analytics.ewmaWindowed(df, Seq("k"), Seq("seq"), "x", 0.3)
      .select("k", "seq", "ewma").as[(Long, Int, Double)].collect()
      .map { case (k, s, v) => (k, s) -> v }.toMap
    val qz = Analytics.ewmaWindowed(df, Seq("k"), Seq("seq"), "x", 0.3,
        quantized = true)
      .select("k", "seq", "ewma").as[(Long, Int, Double)].collect()
    qz.foreach { case (k, s, v) =>
      assert(math.abs(v - nat((k, s))) < 2e-4, s"key=$k seq=$s")
    }
  }

  test("ewmaLast == ewmaWindowed + count + keep-last (both modes, nulls, short keys)") {
    import org.apache.spark.sql.expressions.Window
    // keys with > win rows, == win rows, < win rows, null values inside
    // and outside the trailing window, and an all-null-tail key
    val rows = (1 to 60).map { i =>
      val k = i % 4L
      val v: java.lang.Double =
        if (i % 7 == 0) null else java.lang.Double.valueOf((i * 31 % 97) / 9.0)
      (k, i, v)
    } ++ Seq((9L, 1, null: java.lang.Double), (9L, 2, null: java.lang.Double))
    val df = rows.toDF("k", "seq", "x")
    for (quant <- Seq(false, true)) {
      val oldForm = {
        val smoothed = Analytics.ewmaWindowed(df, Seq("k"), Seq("seq"), "x",
          alpha = 0.3, win = 5, quantized = quant)
        val wAll = Window.partitionBy(col("k"))
        val wLast = wAll.orderBy(col("seq").desc)
        smoothed
          .withColumn("n_events", count(lit(1)).over(wAll))
          .withColumn("_rk", row_number().over(wLast))
          .filter(col("_rk") === 1)
          .select(col("k"), col("n_events"), col("ewma"))
      }
      val newForm = Analytics.ewmaLast(df, Seq("k"), Seq("seq"), "x",
        alpha = 0.3, win = 5, quantized = quant)
      val o = oldForm.orderBy("k").collect().toSeq
      val n = newForm.select("k", "n_events", "ewma").orderBy("k").collect().toSeq
      assert(o == n, s"quant=$quant\nold=$o\nnew=$n")
    }
  }

  test("ewmaLast: partition-count invariant") {
    val df = (1 to 100).map(i => (i % 3L, i, i * 1.7)).toDF("k", "seq", "x")
    def run(parts: Int) = Analytics.ewmaLast(df.repartition(parts),
        Seq("k"), Seq("seq"), "x", 0.3, quantized = true)
      .orderBy("k").select("ewma").as[Double].collect().toSeq
    assert(run(1) == run(7))
  }

  test("ewmaWindowed: partition-count invariant") {
    val df = (1 to 100).map(i => (i % 3L, i, i * 1.7)).toDF("k", "seq", "x")
    def run(parts: Int) = Analytics.ewmaWindowed(df.repartition(parts),
        Seq("k"), Seq("seq"), "x", 0.3, quantized = true)
      .orderBy("k", "seq").select("ewma").as[Double].collect().toSeq
    assert(run(1) == run(7))
  }

  test("gapFillDaily: grid completeness, forward fill, observed flags") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L),
      (1L, ts("2024-01-01 11:00:00"), 7L),   // same day, sums to 12
      (1L, ts("2024-01-04 09:00:00"), 3L),   // 2-day gap
      (2L, ts("2024-01-02 00:00:00"), 1L))
      .toDF("k", "ts", "v")
    val got = Analytics.gapFillDaily(df, "k", "ts", "v")
      .orderBy("k", "day")
      .select(col("k"), date_format(col("day"), "MM-dd").as("d"),
        col("filled_value"), col("observed"))
      .as[(Long, String, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "01-01", 12L, true), (1L, "01-02", 12L, false),
      (1L, "01-03", 12L, false), (1L, "01-04", 3L, true),
      (2L, "01-02", 1L, true)))
  }

  test("zscoreAnomalies: flags exactly the outliers; sigma=0 group flags none") {
    val vals = Seq.fill(20)(10.0) ++ Seq(10.5, 9.5, 100.0)
    val df = vals.map(("a", _)).toDF("g", "x")
      .union(Seq.fill(5)(("flat", 3.0)).toDF("g", "x"))
    val got = Analytics.zscoreAnomalies(df, "g", "x", z = 3.0)
    assert(got.filter(col("is_anomaly")).select("x").as[Double]
      .collect().toSeq == Seq(100.0))
    assert(got.filter(col("g") === "flat")
      .agg(max(abs(col("zscore")))).as[Double].head() == 0.0)
  }

  test("scd2: versions chain and exactly one current row per key") {
    val df = Seq(
      ("k1", ts("2024-01-01 00:00:00"), 1L, "A"),
      ("k1", ts("2024-01-05 00:00:00"), 2L, "B"),
      ("k1", ts("2024-01-09 00:00:00"), 3L, "C"),
      ("k2", ts("2024-02-01 00:00:00"), 4L, "X"))
      .toDF("k", "ct", "seq", "attr")
    val got = Analytics.scd2(df, Seq("k"), Seq("ct", "seq"))
    // chain: valid_to of version i == valid_from of version i+1
    val k1 = got.filter(col("k") === "k1").orderBy("valid_from")
      .select("attr", "valid_from", "valid_to", "is_current")
      .as[(String, Timestamp, Option[Timestamp], Boolean)].collect()
    assert(k1.map(_._1).toSeq == Seq("A", "B", "C"))
    assert(k1(0)._3.contains(k1(1)._2) && k1(1)._3.contains(k1(2)._2))
    assert(k1.map(_._4).toSeq == Seq(false, false, true))
    val currents = got.filter(col("is_current")).groupBy("k").count()
      .as[(String, Long)].collect().toMap
    assert(currents == Map("k1" -> 1L, "k2" -> 1L))
  }

  test("snapshotDiff: added/removed/changed/unchanged incl. null values") {
    val oldDf = Seq((1L, Some("a")), (2L, Some("b")), (3L, None),
      (4L, Some("d"))).toDF("k", "v")
    val newDf = Seq((1L, Some("a")), (2L, Some("B")), (3L, None),
      (5L, Some("e"))).toDF("k", "v")
    val got = Analytics.snapshotDiff(oldDf, newDf, Seq("k"), Seq("v"))
      .select("k", "diff_status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", // null <=> null: present in both, equal
      4L -> "removed", 5L -> "added"))
  }

  test("rollingWindow: RANGE frame over time, not rows; ties are peers") {
    def t(sec: Long) = new Timestamp(ts("2024-01-01 00:00:00").getTime + sec * 1000)
    val df = Seq((1L, t(0), 1L), (1L, t(10), 2L), (1L, t(3590), 4L),
      (1L, t(3600), 8L), (1L, t(7200), 16L),
      (2L, t(100), 1L), (2L, t(100), 2L)) // exact-tie peers
      .toDF("k", "ts", "v")
    val got = Analytics.rollingWindow(df, Seq("k"), "ts", "v",
        windowUs = 3600000000L)
      .select("k", "v", "roll_n", "roll_sum")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 1L, 1L), (1L, 2L, 2L, 3L), (1L, 4L, 3L, 7L),
      (1L, 8L, 3L, 14L),  // t=0 fell out of the 1h window, ROWS would keep it
      (1L, 16L, 1L, 16L),
      (2L, 1L, 2L, 3L), (2L, 2L, 2L, 3L))) // timestamp peers see each other
  }

  test("windowFunnel: order, gaps, horizon and greedy-earliest matching") {
    def t(day: Int, h: Int) = ts(f"2024-01-$day%02d $h%02d:00:00")
    val ev = Seq(
      // A: full path within horizon
      (1L, t(1, 0), "view"), (1L, t(1, 5), "click"), (1L, t(2, 0), "purchase"),
      // B: click BEFORE the first view never counts
      (2L, t(1, 0), "click"), (2L, t(1, 5), "view"),
      // C: view then purchase but no click -> gap caps depth at 1
      (3L, t(1, 0), "view"), (3L, t(1, 5), "purchase"),
      // D: click 8 days after view -> outside the 7-day horizon
      (4L, t(1, 0), "view"), (4L, t(9, 1), "click"),
      // E: no view at all -> absent from the funnel
      (5L, t(1, 0), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = Analytics.windowFunnel(ev, Seq("user_id"), "ts",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"), horizonUs = 7L * 86400000000L)
      .select("user_id", "depth").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 1))
  }

  test("robustScale: outlier-insensitive; IQR=0 group scales to 0") {
    val vals = (1 to 101).map(_.toDouble) :+ 1e9 // one enormous outlier
    val df = vals.map(("a", _)).toDF("g", "x")
      .union(Seq.fill(4)(("flat", 5.0)).toDF("g", "x"))
    val got = Analytics.robustScale(df, "g", "x")
    val a = got.filter(col("g") === "a")
    val (med, iqr) = a.select("med", "iqr").as[(Double, Double)].head()
    // median/IQR barely notice the 1e9 outlier (a mean/σ scaler would)
    assert(med > 50 && med < 53 && iqr > 45 && iqr < 56, s"med=$med iqr=$iqr")
    val outlierScaled = a.filter(col("x") === 1e9)
      .select("scaled").as[Double].head()
    assert(outlierScaled > 1000)
    val bulkMax = a.filter(col("x") < 1000)
      .agg(max(abs(col("scaled")))).as[Double].head()
    assert(bulkMax < 1.5, s"bulk |scaled| max $bulkMax")
    assert(got.filter(col("g") === "flat")
      .agg(max(abs(col("scaled")))).as[Double].head() == 0.0)
  }

  test("touchAttribution: window, ordering, ties, and direct conversions") {
    // user 1: touches at t=1(a), t=2(b), t=3(b); conv at t=5 value 10.0
    //   -> n=3, first=a, last=b(t=3)
    // user 1: second conv at t=2.5 -> only touches t=1,t=2 qualify (n=2)
    // user 2: conv with NO touch in window -> (direct) row, n=0
    // user 3: touch AFTER conv -> not attributed
    val rows = Seq(
      (1L, "2024-01-01 00:00:01", 101L, "touch", "a", 0.0),
      (1L, "2024-01-01 00:00:02", 102L, "touch", "b", 0.0),
      (1L, "2024-01-01 00:00:03", 103L, "touch", "b", 0.0),
      (1L, "2024-01-01 00:00:05", 104L, "conv", null, 10.0),
      (1L, "2024-01-01 00:00:02", 105L, "conv", null, 4.0), // tie: touch at same us excluded (strict <)
      (2L, "2024-01-01 00:00:05", 201L, "conv", null, 7.0),
      (3L, "2024-01-01 00:00:05", 301L, "conv", null, 3.0),
      (3L, "2024-01-01 00:00:06", 302L, "touch", "c", 0.0))
      .toDF("user_id", "tss", "event_id", "kind", "chan", "value")
      .withColumn("ts", to_timestamp(col("tss")))
    val att = Analytics.touchAttribution(rows, "user_id", "ts", "event_id",
      col("kind") === "touch", col("kind") === "conv", col("chan"), "value",
      lookbackUs = 10000000L)
    val byConv = att.collect().groupBy(_.getLong(0))
    // conv 104: 3 touches, first=a (t=1), last=b at t=3 (event 103)
    val c104 = byConv(104L)
    assert(c104.length == 3 && c104.forall(_.getLong(6) == 3L))
    assert(c104.filter(_.getBoolean(7)).map(_.getString(3)).toSeq == Seq("a"))
    val last104 = c104.filter(_.getBoolean(8))
    assert(last104.length == 1 && last104.head.getLong(5) == 103L)
    // conv 105 at t=2: strict < excludes the t=2 touch -> only t=1
    val c105 = byConv(105L)
    assert(c105.length == 1 && c105.head.getLong(6) == 1L &&
      c105.head.getString(3) == "a" &&
      c105.head.getBoolean(7) && c105.head.getBoolean(8))
    // conv 201 and 301: no touches -> single null-channel row, n=0,
    // neither first nor last (gate maps these to full '(direct)' credit)
    Seq(201L, 301L).foreach { id =>
      val r = byConv(id)
      assert(r.length == 1 && r.head.getLong(6) == 0L &&
        r.head.isNullAt(3) && !r.head.getBoolean(7) && !r.head.getBoolean(8),
        s"conv $id: ${r.toSeq}")
    }
    // lookback bound: shrink window to 3.5s -> conv 104 loses the t=1 touch
    val att2 = Analytics.touchAttribution(rows, "user_id", "ts", "event_id",
      col("kind") === "touch", col("kind") === "conv", col("chan"), "value",
      lookbackUs = 3500000L)
    val c104b = att2.filter(col("conv_id") === 104L).collect()
    assert(c104b.length == 2 && c104b.forall(_.getLong(6) == 2L) &&
      c104b.forall(_.getString(3) == "b"))
  }

  test("tokenDrift: zero on identical corpora, bounded JS, asymmetric KL") {
    import graft.operators.Drift
    val a = Seq("x y z", "x x y", "z z z").toDF("text")
    // identical snapshots: all divergences exactly 0 (p == q per term)
    val same = Drift.tokenDrift(a, a, "text").head()
    assert(same.getDouble(3) == 0.0 && same.getDouble(4) == 0.0 &&
      same.getDouble(5) == 0.0, s"identical corpora drift: $same")
    assert(same.getLong(0) == 9L && same.getLong(1) == 9L && same.getLong(2) == 3L)
    // disjoint vocabularies: JS clearly positive, below its ln 2 bound
    // (add-one smoothing pulls tiny corpora well under the bound: with 9
    // tokens over a 6-term joint vocab the smoothed mass dominates)
    val b = Seq("p q r", "p p q", "r r r").toDF("text")
    val dis = Drift.tokenDrift(a, b, "text").head()
    assert(dis.getDouble(5) > 0.15 && dis.getDouble(5) <= math.log(2.0) + 1e-9,
      s"disjoint JS=${dis.getDouble(5)}")
    assert(dis.getLong(2) == 6L, "joint vocab is the union")
    // skewed vs uniform: KL is direction-dependent, JS symmetric
    val u = Seq("a b c d").toDF("text")
    val sk = Seq("a a a a a a a a a a a a a a b c d").toDF("text")
    val d1 = Drift.tokenDrift(u, sk, "text").head()
    val d2 = Drift.tokenDrift(sk, u, "text").head()
    assert(d1.getDouble(3) != d1.getDouble(4), "KL must be asymmetric")
    assert(d1.getDouble(5) == d2.getDouble(5), "JS must be symmetric")
    assert(d1.getDouble(3) == d2.getDouble(4) && d1.getDouble(4) == d2.getDouble(3),
      "swapping corpora swaps KL directions")
    // partition-layout independence: the pico-nat integer sum makes the
    // reduction order-invariant
    val big = spark.range(0, 2000)
      .selectExpr("concat('tok', id % 50, ' tok', id % 7, ' tok', id % 13) AS text")
    val r1 = Drift.tokenDrift(big.repartition(1), big.filter("id % 3 != 0").repartition(1), "text").head()
    val r16 = Drift.tokenDrift(big.repartition(16), big.filter("id % 3 != 0").repartition(16), "text").head()
    assert(r1 == r16, s"layout-dependent drift: $r1 vs $r16")
  }

  test("zipfFit: recovers planted exponent, flat for uniform, layout-invariant") {
    import graft.operators.Drift
    // planted Zipf(s=1): token k appears floor(1200/k) times for k=1..40
    // -> ln(count) ≈ ln(1200) - 1·ln(rank): slope ≈ -1, R² ≈ 1
    val zipf = (1 to 40).flatMap(k => Seq.fill(1200 / k)(s"tok$k"))
    val zdf = zipf.map(t => t: String).toDF("text") // one token per row
    val zf = Drift.zipfFit(zdf, "text", topN = 40).head()
    assert(zf.getLong(0) == 40L)
    assert(math.abs(zf.getDouble(1) + 1.0) < 0.05, s"slope=${zf.getDouble(1)}")
    assert(zf.getDouble(3) > 0.99, s"r2=${zf.getDouble(3)}")
    // uniform counts: slope ~ 0 (floor rounding aside, counts identical)
    val uni = (1 to 40).flatMap(k => Seq.fill(30)(s"tok$k"))
    val uf = Drift.zipfFit(uni.map(t => t: String).toDF("text"), "text", 40).head()
    assert(uf.getDouble(1) == 0.0, s"uniform slope=${uf.getDouble(1)}")
    // pico-quantized moments: partition layout cannot move the fit
    val big = zdf
    val a = Drift.zipfFit(big.repartition(1), "text", 40).head()
    val b = Drift.zipfFit(big.repartition(16), "text", 40).head()
    assert(a == b, s"layout-dependent fit: $a vs $b")
  }

  test("mutualInformation: independence, determinism, bounds") {
    import graft.operators.Drift
    // independent uniform columns: MI exactly 0 at the pico grid
    val ind = (for (x <- 0 until 4; y <- 0 until 4; _ <- 0 until 5)
      yield (s"x$x", s"y$y")).toDF("a", "b")
    val ri = Drift.mutualInformation(ind, "a", "b").head()
    assert(ri.getDouble(5) == 0.0, s"independent MI=${ri.getDouble(5)}")
    assert(ri.getDouble(3) == ri.getDouble(4), "uniform marginals: H_x == H_y")
    // y fully determined by x: MI == H(y) (and ≤ H(x))
    val det = (for (x <- 0 until 6; _ <- 0 until (x + 1))
      yield (s"x$x", s"y${x % 3}")).toDF("a", "b")
    val rd = Drift.mutualInformation(det, "a", "b").head()
    assert(math.abs(rd.getDouble(5) - rd.getDouble(4)) <= 2e-4,
      s"deterministic MI=${rd.getDouble(5)} != H_y=${rd.getDouble(4)}")
    assert(rd.getDouble(5) <= rd.getDouble(3) + 2e-4, "MI must be <= H_x")
    // layout invariance via the pico-quantized sums
    val r1 = Drift.mutualInformation(det.repartition(1), "a", "b").head()
    val r16 = Drift.mutualInformation(det.repartition(16), "a", "b").head()
    assert(r1 == r16)
  }

  test("seasonalNaiveBacktest: perfect season, planted errors, edge scoring") {
    import graft.operators.Analytics
    // key A: perfectly weekly-periodic -> MAE 0, bias 0, scores only
    // days with a 7-day-earlier observation (days 8..14 of 14)
    val a = (1 to 14).map(d => ("A", f"2024-01-$d%02d 10:00:00", (d % 7) * 100L))
    // key B: week 2 exactly 50 cents above week 1 every day -> MAE 50, bias +350
    val b = (1 to 14).map(d =>
      ("B", f"2024-01-$d%02d 10:00:00", 100L + (if (d > 7) 50L else 0L)))
    // key C: only 3 days of history -> no scorable day, absent from output
    val c = (1 to 3).map(d => ("C", f"2024-01-$d%02d 10:00:00", 10L))
    val df = (a ++ b ++ c).toDF("k", "tss", "cents")
      .withColumn("ts", to_timestamp(col("tss")))
    val r = Analytics.seasonalNaiveBacktest(df, "k", "ts", "cents", 7)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getDouble(4))).sortBy(_._1)
    assert(r.map(_._1).toSeq == Seq("A", "B"), s"keys: ${r.toSeq}")
    assert(r(0) == (("A", 7L, 0L, 0L, 0.0)), s"A: ${r(0)}")
    assert(r(1) == (("B", 7L, 350L, 350L, 50.0)), s"B: ${r(1)}")
  }

  test("snapshotDiff: null-to-value transition is changed, not absent") {
    val oldDf = Seq((1L, Option.empty[String])).toDF("k", "v")
    val newDf = Seq((1L, Some("x"))).toDF("k", "v")
    val got = Analytics.snapshotDiff(oldDf, newDf, Seq("k"), Seq("v"))
      .select("diff_status").as[String].head()
    assert(got == "changed")
  }
}
