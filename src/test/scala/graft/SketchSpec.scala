package graft

import graft.sketch._
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Unit + property-style tests for the sketch library, mirroring the
  * reference's statistical assertions (SURVEY.md §5.5 / FIXTURES.md §7).
  * Property tests run seeded-random trials (scalatestplus bridge is not in
  * the offline cache, so no forAll). */
class SketchSpec extends AnyFunSuite {

  /** seeded-random stand-in for forAll */
  private def trials(n: Int)(body: Random => Unit): Unit = {
    (0 until n).foreach(i => body(new Random(1000 + i)))
  }
  private def randList(rnd: Random, maxLen: Int, lo: Int, hi: Int): List[Int] =
    List.fill(rnd.nextInt(maxLen))(lo + rnd.nextInt(hi - lo + 1))

  // ---- HyperLogLog ----------------------------------------------------

  test("HLL accuracy within 3 sigma on 100k ints (distinct.rs:723-737 shape)") {
    val hll = HyperLogLog.forError(0.05)
    (0 until 100000).foreach(i => hll.add(i.toLong))
    val est = hll.estimate
    val err = hll.errorRate
    assert(math.abs(est - 100000) < 3 * err * 100000,
      s"estimate $est too far from 100000 (err=$err)")
  }

  test("HLL merge equals union (distinct.rs:703-721 shape)") {
    val a = new HyperLogLog(12); val b = new HyperLogLog(12); val u = new HyperLogLog(12)
    (0 until 5000).foreach { i => a.add(i.toLong); u.add(i.toLong) }
    (2500 until 8000).foreach { i => b.add(i.toLong); u.add(i.toLong) }
    assert(a.merge(b) == u)
  }

  test("HLL merge is commutative, associative, idempotent (property)") {
    trials(50) { rnd =>
      def mk(l: List[Int]) = l.foldLeft(new HyperLogLog(8))((h, v) => h.add(v.toLong))
      val a = mk(randList(rnd, 200, 0, 10000))
      val b = mk(randList(rnd, 200, 0, 10000))
      val c = mk(randList(rnd, 200, 0, 10000))
      assert(a.merge(b) == b.merge(a))
      assert(a.merge(b).merge(c) == a.merge(b.merge(c)))
      assert(a.merge(a) == a)
    }
  }

  test("HLL small-range (linear counting) is near-exact") {
    val hll = new HyperLogLog(14)
    (0 until 2000).foreach(i => hll.add(i.toLong))
    assert(math.abs(hll.cardinality - 2000L) <= 60, // ~3%: LC variance at m=16384
      s"small-range estimate ${hll.cardinality}")
  }

  // ---- CountMin -------------------------------------------------------

  test("CountMinLong conservative estimate bounds: true <= est <= true + tol*N") {
    val cms = CountMin.longs(0.99, 0.002)
    val rnd = new Random(42)
    val keys = (0 until 500).map(i => s"k$i")
    val truth = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    var total = 0L
    (0 until 100000).foreach { _ =>
      val k = keys(math.min(499, math.abs(rnd.nextGaussian() * 100).toInt))
      cms.addConservative(k, 1)
      truth(k) += 1
      total += 1
    }
    keys.foreach { k =>
      val est = cms.estimate(k)
      assert(est >= truth(k), s"underestimate for $k: $est < ${truth(k)}")
      assert(est <= truth(k) + (0.002 * total).toLong + 1,
        s"overestimate for $k: $est vs ${truth(k)}")
    }
  }

  test("CountMinLong merge is element-wise sum and preserves upper bound") {
    val a = CountMin.longs(0.99, 0.01); val b = CountMin.longs(0.99, 0.01)
    (0 until 1000).foreach(i => a.addConservative(s"x${i % 50}", 1))
    (0 until 1000).foreach(i => b.addConservative(s"x${i % 30}", 1))
    val m = a.merge(b)
    (0 until 50).foreach { i =>
      val k = s"x$i"
      assert(m.estimate(k) >= a.estimate(k).min(1000) + (if (i < 30) b.estimate(k).min(1000) else 0) - 1000)
      assert(m.estimate(k) >= math.max(0, a.estimate(k)))
    }
  }

  // ---- TopFreq --------------------------------------------------------

  test("TopFreq finds heavy hitters on a skewed stream (top.rs:252-291 shape)") {
    val rnd = new Random(7)
    val top = TopFreq[String](10, 0.99, 0.002)
    val truth = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    // zipf-ish: key i with weight ~ 1/(i+1)
    val keys = (0 until 150).map(i => s"key$i")
    val weights = keys.indices.map(i => 1.0 / (i + 1))
    val cum = weights.scanLeft(0.0)(_ + _).tail
    val totalW = cum.last
    (0 until 100000).foreach { _ =>
      val r = rnd.nextDouble() * totalW
      val k = keys(cum.indexWhere(r <= _))
      top.push(k)
      truth(k) += 1
    }
    val got = top.topN.map(_._1).toSet
    val exact = truth.toSeq.sortBy(-_._2).take(6).map(_._1).toSet
    // the clearly-separated head must be present
    assert(exact.subsetOf(got), s"missing heavy hitters: ${exact -- got}")
  }

  test("TopFreq exact regime: n >= distinct keys gives exact counts") {
    val top = TopFreq[String](10, 0.99, 0.002)
    val counts = Map("a" -> 500L, "b" -> 300L, "c" -> 100L)
    counts.foreach { case (k, c) => (0L until c).foreach(_ => top.push(k)) }
    assert(top.topN == Seq("a" -> 500L, "b" -> 300L, "c" -> 100L))
  }

  test("TopFreq merge preserves exact counts in exact regime") {
    val a = TopFreq[String](5, 0.99, 0.002); val b = TopFreq[String](5, 0.99, 0.002)
    (0 until 100).foreach(_ => a.push("x")); (0 until 40).foreach(_ => a.push("y"))
    (0 until 60).foreach(_ => b.push("y")); (0 until 10).foreach(_ => b.push("z"))
    val m = a.merge(b)
    assert(m.topN == Seq("x" -> 100L, "y" -> 100L, "z" -> 10L))
    // commutativity
    assert(b.merge(a).topN == m.topN)
  }

  // ---- TopDistinct ----------------------------------------------------

  test("TopFreq: >=19/20 overlap with exact top-20 under Zipf skew, merged") {
    // Zipf(s=1.1) over 5000 keys by inverse-CDF sampling — the realistic
    // heavy-hitter regime (token/url/key frequencies). With tracking
    // slack (cap = 4n), the reported top 20 must overlap the exact top 20
    // in >=19 keys even when the sketch is built distributed (8 partial
    // sketches merged). Near-uniform data, where ranks n..4n differ by
    // less than the CMS tolerance, is NOT covered by this bound — no
    // bounded-memory sketch can rank statistically-tied keys.
    val rnd = new scala.util.Random(42)
    val nKeys = 5000
    val cum = Array.tabulate(nKeys)(i => 1.0 / math.pow(i + 1, 1.1))
      .scanLeft(0.0)(_ + _).tail
    def draw(): Long = {
      val x = rnd.nextDouble() * cum.last
      val i = java.util.Arrays.binarySearch(cum, x)
      (if (i >= 0) i else -i - 1).toLong
    }
    val data = Array.fill(200000)(draw())
    val exactTop = data.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (k, v) => (-v, k) }.take(20).map(_._1).toSet
    val merged = data.grouped(25000).map { chunk =>
      chunk.foldLeft(TopFreq[Long](20, 0.99, 0.002))((t, k) => t.push(k))
    }.reduce(_ merge _)
    val got = merged.topN.map(_._1).toSet
    assert(got.size == 20)
    val overlap = (exactTop & got).size
    assert(overlap >= 19, s"only $overlap/20 heavy hitters found under Zipf")
  }

  test("TopDistinct ranks keys by distinct-value count") {
    val td = TopDistinct[String](5, 0.99, 0.002, 0.05)
    (0 until 1000).foreach(i => td.push("many", i.toLong))
    (0 until 100).foreach(i => td.push("some", i.toLong))
    (0 until 1000).foreach(i => td.push("few", (i % 10).toLong)) // heavy but low-distinct
    val ranked = td.topN.map(_._1)
    assert(ranked.head == "many")
    assert(ranked.indexOf("some") < ranked.indexOf("few"),
      s"distinct-ranking wrong: $ranked")
    val est = td.topN.head._2
    assert(math.abs(est - 1000L) < 3 * 0.05 * 1000, s"HLL-in-top estimate $est")
  }

  test("TopDistinct merge unions per-key HLLs") {
    val a = TopDistinct[String](5, 0.99, 0.002, 0.05)
    val b = TopDistinct[String](5, 0.99, 0.002, 0.05)
    (0 until 500).foreach(i => a.push("k", i.toLong))
    (250 until 750).foreach(i => b.push("k", i.toLong))
    val est = a.merge(b).topN.head._2
    assert(math.abs(est - 750L) < 3 * 0.05 * 750, s"union estimate $est vs 750")
  }

  // ---- Reservoir ------------------------------------------------------

  test("Reservoir size law: |sample| = min(k, n); seen adds up") {
    val r = new Reservoir[Int](100, 1L)
    (0 until 50).foreach(r.add)
    assert(r.items.length == 50)
    (50 until 5000).foreach(r.add)
    assert(r.items.length == 100 && r.seen == 5000)
  }

  test("Reservoir uniformity: each element roughly equally likely (sample.rs:221-260 shape)") {
    val hits = new Array[Int](200)
    (0 until 400).foreach { trial =>
      val r = new Reservoir[Int](20, trial.toLong)
      (0 until 200).foreach(r.add)
      r.items.foreach(i => hits(i) += 1)
    }
    // expected hits per element = 400*20/200 = 40
    val (mn, mx) = (hits.min, hits.max)
    assert(mn > 15 && mx < 75, s"reservoir skew: min=$mn max=$mx expected~40")
  }

  test("Reservoir merge is size-weighted: bigger stream dominates proportionally") {
    var fromA = 0; var total = 0
    (0 until 200).foreach { trial =>
      val a = new Reservoir[Int](50, trial.toLong)
      val b = new Reservoir[Int](50, (trial + 1000).toLong)
      (0 until 3000).foreach(a.add)            // side A: values < 3000
      (3000 until 4000).foreach(b.add)         // side B: values >= 3000
      val m = a.merge(b)
      assert(m.items.length == 50 && m.seen == 4000)
      fromA += m.items.count(_ < 3000); total += m.items.length
    }
    val frac = fromA.toDouble / total // expect ~0.75
    assert(math.abs(frac - 0.75) < 0.06, s"merge weighting off: $frac vs 0.75")
  }

  // ---- BoundedSort ----------------------------------------------------

  test("BoundedSort equals sorted.take(n) (property)") {
    trials(100) { rnd =>
      val xs = randList(rnd, 300, -1000, 1000)
      val n = 1 + rnd.nextInt(20)
      val bs = xs.foldLeft(new BoundedSort[Int](n, Ordering.Int))(_.add(_))
      assert(bs.sorted == xs.sorted.take(n))
    }
  }

  test("BoundedSort merge equals concat-then-sort-take (property)") {
    trials(100) { rnd =>
      val xs = randList(rnd, 200, -100, 100)
      val ys = randList(rnd, 200, -100, 100)
      val a = xs.foldLeft(new BoundedSort[Int](7, Ordering.Int))(_.add(_))
      val b = ys.foldLeft(new BoundedSort[Int](7, Ordering.Int))(_.add(_))
      assert(a.merge(b).sorted == (xs ++ ys).sorted.take(7))
    }
  }

  // ---- approx quantiles (sk09): rank-error bound vs exact -------------

  test("approx_percentile lands within rank-error bounds of exact") {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    import org.apache.spark.sql.functions._
    // accuracy 1000 -> rank error <= 1/1000; allow 2x slack, check that
    // each approx quantile sits between the exact quantiles at q +- eps
    val eps = 0.002
    val r = li.agg(
      expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99), 1000)").as("ap"),
      expr(s"percentile(l_extendedprice, array(${0.5 - eps}, ${0.95 - eps}, ${0.99 - eps}))").as("lo"),
      expr(s"percentile(l_extendedprice, array(${0.5 + eps}, ${0.95 + eps}, ${0.99 + eps}))").as("hi"))
      .head()
    val ap = r.getSeq[Double](0); val lo = r.getSeq[Double](1); val hi = r.getSeq[Double](2)
    (0 until 3).foreach { i =>
      assert(ap(i) >= lo(i) && ap(i) <= hi(i),
        s"quantile $i out of rank bounds: ${ap(i)} not in [${lo(i)}, ${hi(i)}]")
    }
  }

  // ---- compaction -----------------------------------------------------

  test("HLL serialization golden: register layout and Kryo wire bytes are pinned") {
    // Reference precedent: amadeus cross-checks its HLL serialized form
    // against a protobuf golden (amadeus-streaming/src/distinct.rs:738-756)
    // so a layout change between versions cannot silently corrupt merged
    // state. Here both layers are pinned for a fixed input: the register
    // array (hash/rank algorithm golden) and the Kryo-encoded aggregation
    // buffer exactly as it crosses the exchange (wire-format golden). If a
    // Spark/Kryo upgrade changes the wire bytes, this fails LOUDLY and the
    // golden must be consciously re-pinned (mixed-version clusters merging
    // old and new buffers would disagree).
    import graft.sketch.HyperLogLog
    def md5(bytes: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
    val hll = new HyperLogLog(8)
    (0 until 1000).foreach(i => hll.add(s"item-$i"))
    assert(hll.registers.take(16).map("%02x".format(_)).mkString ==
      "05040507020204020300010205030101", "register prefix drifted")
    assert(md5(hll.registers) == "04351aa23fc8f3b200c4c43a55046e20",
      "register array golden drifted: hashAny/rank/layout changed")
    assert(hll.cardinality == 936L, "estimate drifted (1000 true distinct, b=8)")
    val enc = org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.Encoders.kryo[HyperLogLog]
        .asInstanceOf[org.apache.spark.sql.catalyst.encoders.AgnosticEncoder[HyperLogLog]])
    val row = enc.createSerializer()(hll)
    val bytes = row.getBinary(0)
    assert(bytes.length == 294, s"Kryo buffer length drifted: ${bytes.length}")
    assert(md5(bytes) == "addb06a579008fd3ddedcfab082218af",
      "Kryo wire-format golden drifted: re-pin consciously after verifying " +
        "mixed-version merge safety")
    // deserialize -> merge round trip stays exact
    val back = enc.resolveAndBind().createDeserializer()(row)
    assert(back.merge(hll).cardinality == hll.cardinality)
    assert(back == hll)
  }

  test("compactParquet merges small files, preserves rows and content") {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val li = graft.Tables.lineitem(spark, "/root/testdata/sf0.01")
    li.repartition(40).write.mode("overwrite").parquet(s"$tmp/in") // 40 small files
    val stats = graft.operators.Maintenance.compactParquet(
      spark, s"$tmp/in", s"$tmp/out", targetFileMB = 64)
    assert(stats.inputFiles >= 40)
    assert(stats.outputFiles < 40)
    assert(stats.rows == li.count())
    // partition-order-independent content check (double sums differ in
    // last ULPs across partitionings, by design)
    val a = spark.read.parquet(s"$tmp/in").agg(sum("l_orderkey")).head().getLong(0)
    val b = spark.read.parquet(s"$tmp/out").agg(sum("l_orderkey")).head().getLong(0)
    assert(a == b)
    val outFiles = new java.io.File(s"$tmp/out").listFiles().count(_.getName.endsWith(".parquet"))
    assert(outFiles == stats.outputFiles)
  }

  test("slidingDistinct: merged hourly sketches == sketch of the window union") {
    // the merge law is EXACT (register max), so each window's estimate
    // must bit-equal an HLL built directly on that window's raw ids
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val ev = (0 until 600).map { i =>
      (new java.sql.Timestamp(base + (i % 12) * 3600000L + (i % 60) * 1000L),
        (i % 37).toLong)
    }.toDF("ts", "user_id")
    val got = graft.operators.SketchViews
      .slidingDistinct(ev, "ts", "user_id", windowHours = 3, b = 12)
      .as[(Long, Long)].collect().toMap
    // expected positions: hours 0..11 each occupied -> ends 0..13 (+2 trailing)
    assert(got.size == 14)
    val hourUs = 3600000000L
    val baseUs = base * 1000L
    got.foreach { case (endUs, est) =>
      val loH = (endUs - baseUs) / hourUs - 2
      val direct = new HyperLogLog(12)
      (0 until 600).foreach { i =>
        val h = i % 12
        if (h >= loH && h <= loH + 2) direct.add((i % 37).toLong)
      }
      assert(est == direct.cardinality,
        s"window end ${(endUs - baseUs) / hourUs}: $est != ${direct.cardinality}")
    }
  }

  test("HLL set algebra: union, inclusion-exclusion intersection, jaccard") {
    val a = new HyperLogLog(14); (1 to 10000).foreach(a.add)
    val b = new HyperLogLog(14); (5001 to 15000).foreach(b.add)
    val sigma = 1.04 / math.sqrt(1 << 14)
    val u = a.merge(b).estimate
    assert(math.abs(u - 15000) <= 3 * sigma * 15000, s"union=$u")
    val i = HyperLogLog.intersectionEstimate(a, b)
    assert(math.abs(i - 5000) <= 3 * sigma * (10000 + 10000 + 15000),
      s"intersection=$i")
    val j = HyperLogLog.jaccardEstimate(a, b)
    assert(math.abs(j - 1.0 / 3) < 0.05, s"jaccard=$j")
    // disjoint sets: intersection estimate collapses toward 0
    val c = new HyperLogLog(14); (20001 to 30000).foreach(c.add)
    assert(math.abs(HyperLogLog.intersectionEstimate(a, c))
      <= 3 * sigma * (10000 + 10000 + 20000))
    // merge is non-destructive: operands unchanged by the set ops
    assert(math.abs(a.estimate - 10000) <= 3 * sigma * 10000)
  }

  // ---- Theta / KMV ----------------------------------------------------

  test("Theta is exact below k and bounded at k") {
    val t = new Theta(64)
    (1 to 50).foreach(t.add)
    (1 to 50).foreach(t.add) // re-adds are idempotent
    assert(t.estimate == 50.0 && !t.isFull)
    (51 to 5000).foreach(t.add)
    assert(t.size == 64, "retained set must stay bounded at k")
  }

  test("Theta accuracy within 3 sigma on 100k distinct") {
    val t = new Theta(1024)
    (0 until 100000).foreach(i => t.add(i.toLong))
    val err = t.errorRate
    assert(math.abs(t.estimate - 100000) < 3 * err * 100000,
      s"estimate ${t.estimate} too far from 100000 (err=$err)")
  }

  test("Theta merge is commutative, associative, idempotent (property)") {
    trials(50) { rnd =>
      def mk(l: List[Int]) = l.foldLeft(new Theta(32))((t, v) => t.add(v.toLong))
      val a = mk(randList(rnd, 200, 0, 10000))
      val b = mk(randList(rnd, 200, 0, 10000))
      val c = mk(randList(rnd, 200, 0, 10000))
      assert(a.merge(b) == b.merge(a))
      assert(a.merge(b).merge(c) == a.merge(b.merge(c)))
      assert(a.merge(a) == a)
    }
  }

  test("Theta merge equals union sketch built from the union stream") {
    val a = new Theta(128); val b = new Theta(128); val u = new Theta(128)
    (0 until 5000).foreach { i => a.add(i.toLong); u.add(i.toLong) }
    (2500 until 8000).foreach { i => b.add(i.toLong); u.add(i.toLong) }
    assert(a.merge(b) == u,
      "k smallest of merged retained sets must equal the direct union sketch")
  }

  test("Theta direct intersection and difference track planted overlap") {
    val k = 1024
    val a = new Theta(k); (1 to 20000).foreach(i => a.add(i.toLong))
    val b = new Theta(k); (15001 to 35000).foreach(i => b.add(i.toLong))
    // sampled-region estimators: error scales with the UNION at theta,
    // 3 sigma ~ 3/sqrt(k-2) relative to the union size (35k)
    val tol = 3.0 / math.sqrt((k - 2).toDouble) * 35000
    val i = Theta.intersectionEstimate(a, b)
    assert(math.abs(i - 5000) <= tol, s"intersection=$i want 5000 +- $tol")
    val d = Theta.aNotBEstimate(a, b)
    assert(math.abs(d - 15000) <= tol, s"aNotB=$d want 15000 +- $tol")
    val d2 = Theta.aNotBEstimate(b, a)
    assert(math.abs(d2 - 15000) <= tol, s"bNotA=$d2 want 15000 +- $tol")
    val j = Theta.jaccardEstimate(a, b)
    assert(math.abs(j - 5000.0 / 35000) < 0.05, s"jaccard=$j")
    // the HLL-impossible case: SMALL overlap of two big sets stays
    // resolvable (inclusion-exclusion error would swamp a 50-row overlap)
    val c = new Theta(k); (19951 to 40000).foreach(i => c.add(i.toLong))
    val small = Theta.intersectionEstimate(a, c)
    assert(small >= 0 && small <= 50 + tol, s"small intersection=$small")
    // disjoint sets: exactly zero retained in both below theta
    val z = new Theta(k); (100001 to 120000).foreach(i => z.add(i.toLong))
    assert(Theta.aNotBEstimate(a, a) == 0.0)
    assert(Theta.jaccardEstimate(a, z) == 0.0)
  }

  test("Theta set ops are exact while both sketches are below k") {
    val a = new Theta(1024); (1 to 500).foreach(i => a.add(i.toLong))
    val b = new Theta(1024); (301 to 900).foreach(i => b.add(i.toLong))
    assert(Theta.intersectionEstimate(a, b) == 200.0)
    assert(Theta.aNotBEstimate(a, b) == 300.0)
    assert(Theta.aNotBEstimate(b, a) == 400.0)
    assert(Theta.jaccardEstimate(a, b) == 200.0 / 900.0)
  }

  test("GridHistogram: exact bound, merge laws, out-of-grid accounting") {
    val rnd = new Random(7)
    val vals = Array.fill(50000)(rnd.nextDouble() * 1000.0)
    val h = new GridHistogram(0.0, 1000.0, 256)
    vals.foreach(h.add)
    val sorted = vals.sorted
    // deterministic error contract: every quantile within one bucket width
    Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 1.0).foreach { q =>
      val exact = sorted((math.ceil(q * vals.length) - 1).toInt)
      val est = h.quantile(q)
      assert(math.abs(est - exact) <= h.width + 1e-9,
        s"q=$q est=$est exact=$exact width=${h.width}")
    }
    // merge == sketch of concatenation, exactly
    val (l, r) = vals.splitAt(20000)
    val hl = new GridHistogram(0.0, 1000.0, 256); l.foreach(hl.add)
    val hr = new GridHistogram(0.0, 1000.0, 256); r.foreach(hr.add)
    assert(hl.merge(hr) == h)
    assert(hl.merge(hr).quantile(0.5) == h.quantile(0.5))
    assert(hr.merge(hl) == hl.merge(hr), "merge commutes")
    // out-of-grid values are counted, never silently dropped, and make
    // quantile fail loudly
    val g = new GridHistogram(0.0, 10.0, 4)
    g.add(-1.0); g.add(5.0); g.add(10.0); g.add(99.0)
    assert(g.under == 1L && g.over == 2L && g.total == 4L && g.inRange == 1L)
    intercept[IllegalArgumentException](g.quantile(0.5))
    // NaN fails both range checks and floor(NaN).toInt == 0 — it must be
    // surfaced like other out-of-grid values, never bucketed into bin 0
    val nh = new GridHistogram(0.0, 10.0, 4)
    nh.add(Double.NaN); nh.add(5.0)
    assert(nh.nan == 1L && nh.counts(0) == 0L && nh.inRange == 1L &&
      nh.total == 2L)
    intercept[IllegalArgumentException](nh.quantile(0.5))
    val nh2 = new GridHistogram(0.0, 10.0, 4)
    nh2.add(Double.NaN)
    assert(nh.merge(nh2).nan == 2L, "merge carries the NaN count")
    // hi-adjacent ulp guard: a value just below hi lands in the last bucket
    val e = new GridHistogram(0.0, 10.0, 4)
    e.add(math.nextDown(10.0))
    assert(e.counts(3) == 1L && e.over == 0L)
    // param guards
    intercept[IllegalArgumentException](new GridHistogram(1.0, 1.0, 4))
    intercept[IllegalArgumentException](
      h.merge(new GridHistogram(0.0, 1000.0, 128)))
    intercept[IllegalArgumentException](h.quantile(0.0))
  }

  test("HLL byte export: round-trip identity, replayable estimate, loud failures") {
    val rnd = new Random(21)
    val h = new HyperLogLog(8)
    (0 until 5000).foreach(_ => h.addHash(rnd.nextLong()))
    // round trip is the identity on state
    val back = HyperLogLog.fromBytes(h.toBytes)
    assert(back == h && back.toBytes.sameElements(h.toBytes))
    assert(h.toBytes.length == 2 + 256 &&
      h.toBytes(0) == 1 && h.toBytes(1) == 8)
    // rational-form estimate agrees with the float-sum estimate to well
    // inside HLL noise (they differ only by summation ulps)
    assert(math.abs(back.estimateReplayable - h.estimate) / h.estimate < 1e-12)
    // linear-counting branch taken identically in both forms
    val small = new HyperLogLog(8)
    (0 until 20).foreach(_ => small.addHash(rnd.nextLong()))
    assert(small.estimateReplayable == small.estimate,
      "small-range branch must match exactly (same ln path)")
    // foreign bytes fail loudly
    intercept[IllegalArgumentException](
      HyperLogLog.fromBytes(Array[Byte](2, 8) ++ new Array[Byte](256)))
    intercept[IllegalArgumentException](
      HyperLogLog.fromBytes(Array[Byte](1, 8) ++ new Array[Byte](99)))
    intercept[IllegalArgumentException](HyperLogLog.fromBytes(Array[Byte](1)))
  }

  test("HLL sketch table laws: sharded-bytes merge == one-pass build; mismatched b fails") {
    val rnd = new Random(33)
    val hashes = Array.fill(30000)(rnd.nextLong())
    val direct = new HyperLogLog(8)
    hashes.foreach(direct.addHash)
    // shard into 7 sketches, export each, merge the BYTES only
    val merged = hashes.grouped(4500).map { chunk =>
      val h = new HyperLogLog(8); chunk.foreach(h.addHash); h.toBytes
    }.foldLeft(new HyperLogLog(8))((acc, b) =>
      acc.merge(HyperLogLog.fromBytes(b)))
    assert(merged == direct, "bytes merge must equal the one-pass sketch")
    assert(merged.estimateReplayable == direct.estimateReplayable)
    // precision mismatch is loud, never silent garbage
    val other = new HyperLogLog(10)
    intercept[IllegalArgumentException](
      direct.merge(HyperLogLog.fromBytes(other.toBytes)))
  }

  test("Theta/GridHistogram byte exports: round-trip identity, loud failures") {
    val rnd = new Random(55)
    val t = new Theta(64, 48)
    (0 until 5000).foreach(_ => t.addRaw(rnd.nextLong() & ((1L << 48) - 1)))
    val tb = Theta.fromBytes(t.toBytes)
    assert(tb == t && tb.toBytes.sameElements(t.toBytes))
    assert(tb.estimate == t.estimate)
    // partial (below-k) sketch round-trips too
    val small = new Theta(64, 48); small.addRaw(5L); small.addRaw(9L)
    assert(Theta.fromBytes(small.toBytes) == small)
    intercept[IllegalArgumentException](Theta.fromBytes(Array[Byte](2)))
    intercept[IllegalArgumentException](
      Theta.fromBytes(t.toBytes.dropRight(1)))
    // theta sketch-table law: sharded-bytes merge == one-pass build
    val direct = new Theta(64, 48)
    val hashes48 = Array.fill(5000)(rnd.nextLong() & ((1L << 48) - 1))
    hashes48.foreach(direct.addRaw)
    val merged = hashes48.grouped(800).map { chunk =>
      val s = new Theta(64, 48); chunk.foreach(s.addRaw); s.toBytes
    }.foldLeft(new Theta(64, 48))((acc, b) => acc.merge(Theta.fromBytes(b)))
    assert(merged == direct && merged.estimate == direct.estimate,
      "theta bytes merge must equal the one-pass sketch")
    val g = new GridHistogram(0.0, 100.0, 32)
    (0 until 2000).foreach(_ => g.add(rnd.nextDouble() * 120.0 - 10.0))
    g.add(Double.NaN)
    val gb = GridHistogram.fromBytes(g.toBytes)
    assert(gb == g && gb.toBytes.sameElements(g.toBytes))
    assert(gb.under == g.under && gb.over == g.over && gb.nan == g.nan)
    intercept[IllegalArgumentException](
      GridHistogram.fromBytes(g.toBytes.dropRight(3)))
  }

  test("Theta rejects out-of-domain raw values and mismatched params") {
    val t = new Theta(64)
    intercept[IllegalArgumentException](t.addRaw(-1L))
    intercept[IllegalArgumentException](t.addRaw(1L << 48))
    intercept[IllegalArgumentException](t.merge(new Theta(32)))
    intercept[IllegalArgumentException](
      Theta.intersectionEstimate(new Theta(64, 48), new Theta(64, 62)))
  }

  // ---- heavy-hitter / reservoir / bounded-sort byte exports -----------

  test("TopFreq byte export: round-trip identity, merge law, loud failures") {
    trials(20) { rnd =>
      val a = new TopFreq[Long](5, 4, 64)
      val b = new TopFreq[Long](5, 4, 64)
      (0 until 500).foreach(_ => a.push(rnd.nextInt(40).toLong))
      (0 until 500).foreach(_ => b.push(rnd.nextInt(40).toLong))
      // round-trip: full state (tracked map AND CMS cells) survives
      val a2 = TopFreq.fromBytes[Long](a.toBytes)
      assert(a2.heavy == a.heavy, "tracked map must round-trip")
      assert(a2.cms.cells.sameElements(a.cms.cells), "CMS cells must round-trip")
      assert(a2.topN == a.topN)
      assert(a2.toBytes.sameElements(a.toBytes), "re-export must be byte-identical")
      // merge law: merging re-imported state == merging originals
      val viaBytes = TopFreq.fromBytes[Long](a.toBytes)
        .merge(TopFreq.fromBytes[Long](b.toBytes))
      val direct = a.merge(b)
      assert(viaBytes.topN == direct.topN, "bytes merge must equal direct merge")
      assert(viaBytes.cms.cells.sameElements(direct.cms.cells))
      // a re-imported sketch keeps ACCEPTING pushes like the original
      val c1 = TopFreq.fromBytes[Long](a.toBytes).push(7L).push(7L)
      val c2 = new TopFreq[Long](5, 4, 64)
      a.heavy.foreach { case (k, v) => c2.heavy.update(k, v) }
      System.arraycopy(a.cms.cells, 0, c2.cms.cells, 0, a.cms.cells.length)
      c2.push(7L).push(7L)
      assert(c1.heavy == c2.heavy)
    }
    // string keys round-trip through the utf8 codec
    val s = new TopFreq[String](3, 2, 32)
    Seq("alpha", "beta", "beta", "γ-unicode", "γ-unicode", "γ-unicode")
      .foreach(s.push(_))
    val s2 = TopFreq.fromBytes[String](s.toBytes)
    assert(s2.topN == s.topN && s2.heavy == s.heavy)
    // loud failures: version, key-type mismatch, truncation
    val ok = s.toBytes
    intercept[IllegalArgumentException](TopFreq.fromBytes[Long](ok))
    intercept[IllegalArgumentException](TopFreq.fromBytes[String](ok.dropRight(5)))
    val badVer = ok.clone(); badVer(0) = 9
    intercept[IllegalArgumentException](TopFreq.fromBytes[String](badVer))
  }

  test("TopFreq export is canonical: one push per key is layout-order-independent") {
    // pre-aggregated regime (the sk25 gate's): each key pushed once with
    // its total; absent full-depth collisions the cells are max-combined
    // per slot, so ANY single-buffer push order yields identical bytes
    val keys = (0 until 30).map(k => k.toLong * 7919 -> (10L + k))
    val fwd = new TopFreq[Long](10, 4, 256)
    val rev = new TopFreq[Long](10, 4, 256)
    keys.foreach { case (k, c) => fwd.push(k, c) }
    keys.reverse.foreach { case (k, c) => rev.push(k, c) }
    assert(fwd.toBytes.sameElements(rev.toBytes),
      "single-buffer pre-aggregated build must be order-independent")
  }

  test("TopDistinct byte export: round-trip identity and merge law") {
    trials(10) { rnd =>
      val a = new TopDistinct[Long](4, 2, 16, 6)
      val b = new TopDistinct[Long](4, 2, 16, 6)
      (0 until 300).foreach(_ => a.push(rnd.nextInt(20).toLong, rnd.nextInt(500)))
      (0 until 300).foreach(_ => b.push(rnd.nextInt(20).toLong, rnd.nextInt(500)))
      val a2 = TopDistinct.fromBytes[Long](a.toBytes)
      assert(a2.heavy == a.heavy, "tracked HLLs must round-trip")
      assert(a2.topN == a.topN)
      assert(a2.toBytes.sameElements(a.toBytes))
      val viaBytes = TopDistinct.fromBytes[Long](a.toBytes)
        .merge(TopDistinct.fromBytes[Long](b.toBytes))
      assert(viaBytes.topN == a.merge(b).topN)
    }
    intercept[IllegalArgumentException](
      TopDistinct.fromBytes[Long](new TopDistinct[Long](4, 2, 16, 6).toBytes.drop(1)))
  }

  test("Reservoir byte export: full resumable state, continued stream is identical") {
    val r = new Reservoir[Long](10, 42L)
    (1L to 100L).foreach(r.add)
    val r2 = Reservoir.fromBytes[Long](r.toBytes)
    assert(r2.items == r.items && r2.seen == r.seen)
    assert(r2.toBytes.sameElements(r.toBytes))
    // the draw counter round-trips: continuing the stream on the import
    // takes the SAME eviction decisions as continuing on the original
    (101L to 200L).foreach { v => r.add(v); r2.add(v) }
    assert(r2.items == r.items, "resumed reservoir must replay identically")
    // string elements + loud failures
    val rs = new Reservoir[String](3, 7L)
    Seq("a", "bb", "ccc", "dddd", "éé").foreach(rs.add)
    val rs2 = Reservoir.fromBytes[String](rs.toBytes)
    assert(rs2.items == rs.items && rs2.seen == rs.seen)
    intercept[IllegalArgumentException](Reservoir.fromBytes[Long](rs.toBytes))
    intercept[IllegalArgumentException](
      Reservoir.fromBytes[String](rs.toBytes.dropRight(1)))
  }

  test("Reservoir import rejects exports violating m == min(seen, k)") {
    // a truncated-entry export with a patched entry count passes the
    // bounds checks (m <= k, seen >= m, no trailing bytes) but resuming
    // it would APPEND until the buffer refills — a silently non-uniform
    // sample. The invariant check must fail loudly instead.
    val r = new Reservoir[Long](10, 42L)
    (1L to 100L).foreach(r.add)          // full: k=10, seen=100, m=10
    val full = r.toBytes                 // header 34B + 10 * (4B len + 8B) entries
    val forged = full.take(34 + 3 * 12)  // keep only 3 entries...
    forged(33) = 3.toByte                // ...and patch m (big-endian int at 30) to 3
    val e = intercept[IllegalArgumentException](Reservoir.fromBytes[Long](forged))
    assert(e.getMessage.contains("min(seen, k)"))
    // the untampered export still parses
    assert(Reservoir.fromBytes[Long](full).items == r.items)
  }

  test("GkQuantile: rank error within eps*N on adversarial streams; merge bound; space") {
    import graft.sketch.GkQuantile
    def rankErr(data: Seq[Double], gk: GkQuantile, q: Double): Long = {
      val v = gk.query(q)
      val sorted = data.sorted
      val target = math.max(1L, math.ceil(q * data.size).toLong)
      val first = sorted.indexOf(v) + 1
      assert(first > 0, s"query returned a value not in the stream: $v")
      val last = sorted.lastIndexOf(v) + 1
      if (target < first) first - target
      else if (target > last) target - last else 0L
    }
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val streams: Seq[(String, Seq[Double])] = Seq(
      "ascending" -> (1 to 20000).map(_.toDouble),
      "descending" -> (1 to 20000).map(i => (20001 - i).toDouble),
      "pseudo-random" -> (1 to 20000).map(i => ((i * 2654435761L) % 100003).toDouble),
      "heavy-ties" -> (1 to 20000).map(i => (i % 17).toDouble))
    for ((name, s) <- streams) {
      val gk = s.foldLeft(new GkQuantile(0.01))(_.add(_))
      assert(gk.count == s.size)
      assert(gk.size < 1200, s"$name: space blew up: ${gk.size} tuples")
      for (q <- qs) {
        val err = rankErr(s, gk, q)
        assert(err <= math.ceil(0.01 * s.size).toLong + 1,
          s"$name q=$q rank error $err > ${0.01 * s.size}")
      }
    }
    // 8-way shard merge: additive bound 2*eps*N
    val data = (1 to 40000).map(i => ((i * 48271L) % 65537).toDouble)
    val merged = data.grouped(5000)
      .map(_.foldLeft(new GkQuantile(0.01))(_.add(_))).reduce(_ merge _)
    assert(merged.count == data.size)
    for (q <- qs) {
      val err = rankErr(data, merged, q)
      assert(err <= math.ceil(2 * 0.01 * data.size).toLong + 1,
        s"merged q=$q rank error $err")
    }
    // exact regime: small streams answer exactly
    val tiny = Seq(5.0, 1.0, 3.0, 2.0, 4.0)
    val g2 = tiny.foldLeft(new GkQuantile(0.05))(_.add(_))
    assert(g2.query(0.5) == 3.0 && g2.query(0.0) == 1.0 && g2.query(1.0) == 5.0)
  }

  test("GkQuantile.merge: uniform no-alias semantics on empty-side merges") {
    import graft.sketch.GkQuantile
    val a = (1 to 100).map(_.toDouble).foldLeft(new GkQuantile(0.05))(_.add(_))
    val empty = new GkQuantile(0.05)
    val m1 = a.merge(empty)
    assert(!(m1 eq a) && !(m1 eq empty), "merge(empty) must return a copy")
    m1.add(1e9) // mutating the result must NOT mutate the operand
    assert(a.count == 100 && a.query(1.0) == 100.0,
      "operand mutated through an aliased empty-side merge result")
    val m2 = empty.merge(a)
    assert(!(m2 eq a) && !(m2 eq empty), "empty.merge(a) must return a copy")
    m2.add(-1e9)
    assert(a.count == 100 && a.query(1.0) == 100.0)
    // copies still answer like the original (size flushes the add buffer)
    assert(m1.size >= 1 && m2.size >= 1)
    assert(m1.count == 101 && m2.count == 101)
  }

  test("TopFreq mergeCanonical evicts in codec order, matching the SQL rebuild") {
    // Long keys 1..12 tied at count 1, cap 8: String.valueOf order keeps
    // {1,10,11,12,2,3,4,5} ("10" < "9" lexicographically) while the
    // byte-export contract (ORDER BY cnt DESC, key — what toBytes writes
    // and the sk25/sk26 SQL replays compute) keeps {1..8}. The byte-
    // table aggregators merge with the canonical form so a merged
    // shard's tracked SET can never diverge from the relational rebuild.
    import graft.sketch.KeyCodec
    val a = new TopFreq[Long](2, 4, 64); val b = new TopFreq[Long](2, 4, 64)
    (1L to 6L).foreach(a.push(_)); (7L to 12L).foreach(b.push(_))
    val canon = a.mergeCanonical(b)(KeyCodec.LongKey)
    assert(canon.heavy.keySet == (1L to 8L).toSet,
      s"canonical merge must keep codec-order keys: ${canon.heavy.keySet}")
    val lex = a.merge(b)
    assert(lex.heavy.keySet == Set(1L, 10L, 11L, 12L, 2L, 3L, 4L, 5L),
      s"String.valueOf order differs by construction: ${lex.heavy.keySet}")
  }

  test("TopFreq merge breaks cap-boundary count ties deterministically") {
    // 12 tied keys, cap 8: which 8 survive must depend on the ranking
    // (count DESC, key ASC), not on HashMap iteration or operand order —
    // otherwise merged shard EXPORTS differ run to run even though
    // toBytes itself is canonical.
    val a = new TopFreq[String](2, 4, 64); val b = new TopFreq[String](2, 4, 64)
    assert(a.cap == 8)
    (1 to 6).foreach(i => a.push(f"k$i%02d"))
    (7 to 12).foreach(i => b.push(f"k$i%02d"))
    val ab = a.merge(b); val ba = b.merge(a)
    val want = (1 to 8).map(i => f"k$i%02d").toSet
    assert(ab.heavy.keySet == want, s"tie-break not canonical: ${ab.heavy.keySet}")
    assert(ab.toBytes.sameElements(ba.toBytes),
      "merge must be byte-deterministic across operand order under ties")
  }

  test("heavy-hitter shard table survives parquet: write, read back, roll up") {
    // the sketch-TABLE claim is that shards are PERSISTED state: binary
    // TopFreq exports written to plain parquet and rolled up later by a
    // different job must answer exactly like the in-memory pipeline
    val spark = graft.GraftSession.builder("local[4]", 4).getOrCreate()
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.aggregators.SketchAggregators.{contramap, TopFreqMergeTopNAgg}
    val events = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type"), col("ts"), col("user_id"))
    val shards = graft.streaming.EventStreams.topFreqUserShards(events)
    val dir = "target/qtmp/sk26_spec_shards"
    shards.write.mode("overwrite").parquet(dir)
    def rollup(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String, Array[Byte])].groupByKey(_._1)
        .agg(contramap((t: (String, String, Array[Byte])) => t._3,
          new TopFreqMergeTopNAgg[Long](50, 4, 2048)).toColumn.name("top"))
        .collect().toMap
    val direct = rollup(shards)
    val reread = rollup(spark.read.parquet(dir))
    assert(direct.nonEmpty && reread == direct,
      "parquet-persisted shards must roll up identically")
    val exact = events.groupBy(col("event_type"), col("user_id")).count()
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).map { case (t, rows) =>
        t -> rows.map(r => (r._2, r._3)).sortBy { case (u, c) =>
          (-c, String.valueOf(u)) }.take(50).toSeq }
    assert(reread.view.mapValues(_.toSeq).toMap == exact,
      "persisted-shard rollup must equal exact per-type top-50")
  }

  test("BoundedSort byte export: round-trip under the caller's ordering") {
    val ord = Ordering.Long.reverse // keep the n LARGEST
    val bs = new BoundedSort[Long](5, ord)
    Seq(3L, 9L, 1L, 14L, 7L, 2L, 11L, 5L).foreach(bs.add)
    val bs2 = BoundedSort.fromBytes[Long](bs.toBytes, ord)
    assert(bs2.sorted == bs.sorted)
    assert(bs2.toBytes.sameElements(bs.toBytes))
    intercept[IllegalArgumentException](
      BoundedSort.fromBytes[String](bs.toBytes, Ordering.String))
  }
}
