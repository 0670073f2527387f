package graft

import graft.aggregators.SketchAggregators._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Spark-level tests for the sketch Aggregators: results must be
  * independent of physical partitioning — the moral equivalent of the
  * reference's `_dist.rs` mirror test suite (SURVEY.md §5.3). */
class AggregatorSpec extends AnyFunSuite with CacheHygiene {

  lazy val spark: SparkSession = GraftSession.builder("local[4]", 4).getOrCreate()

  test("HllDistinct is partition-count independent and near-exact") {
    import spark.implicits._
    val data = (0 until 20000).map(i => (i % 3000).toLong)
    val agg = new HllDistinct[Long](14, identity)
    val est1 = data.toDS().repartition(1).select(agg.toColumn).head()
    val est16 = data.toDS().repartition(16).select(agg.toColumn).head()
    assert(est1 == est16, "partition-dependent HLL result")
    assert(math.abs(est1 - 3000L) < 3 * 0.0081 * 3000 + 1)
  }

  test("MostFrequent exact regime is partition-count independent and exact") {
    import spark.implicits._
    val data = (0 until 10000).map(i => s"key${i % 7}")
    val agg = new MostFrequent[String, String](10, 0.99, 0.002, identity)
    val r1 = data.toDS().repartition(1).select(agg.toColumn).head()
    val r16 = data.toDS().repartition(16).select(agg.toColumn).head()
    assert(r1 == r16)
    assert(r1.toMap == (0 until 7).map(i => s"key$i" -> (10000 / 7 + (if (i < 10000 % 7) 1 else 0)).toLong).toMap)
  }

  test("SortNBy via groupByKey equals window-function answer") {
    import spark.implicits._
    val data = (0 until 5000).map(i => (s"g${i % 4}", i.toLong, (i * 37 % 1000).toDouble))
    val ord = Ordering.by[(String, Long, Double), (Double, Long)](t => (-t._3, t._2))
    val agg = new SortNBy[(String, Long, Double)](5, ord)
    val got = data.toDS().repartition(8).groupByKey(_._1)
      .agg(agg.toColumn.name("top")).collect().toMap
    val expected = data.groupBy(_._1).map { case (g, rows) =>
      g -> rows.sortBy(t => (-t._3, t._2)).take(5).toSeq
    }
    assert(got == expected)
  }

  test("SampleUnstable returns exactly k rows from the input") {
    import spark.implicits._
    val data = (0L until 10000L).toDS()
    val agg = new SampleUnstable[Long](50, 42L)
    val sample = data.repartition(13).select(agg.toColumn).head()
    assert(sample.length == 50)
    assert(sample.forall(v => v >= 0 && v < 10000))
    assert(sample.distinct.length == 50, "reservoir drew a duplicate")
  }

  test("KahanMean / WelfordStddev match exact computation") {
    import spark.implicits._
    val data = (1 to 9999).map(_.toDouble * 0.1)
    val mean = data.sum / data.length
    val sd = math.sqrt(data.map(x => (x - mean) * (x - mean)).sum / data.length)
    val ds = data.toDS().repartition(7)
    val (gotMean, gotSd) = ds.select(
      new KahanMean[Double](identity).toColumn.name("m"),
      new WelfordStddev[Double](identity).toColumn.name("sd")).head()
    assert(math.abs(gotMean - mean) < 1e-9)
    assert(math.abs(gotSd - sd) < 1e-9)
  }

  test("zip2 + contramap compose like nested sub-sinks under group_by") {
    import spark.implicits._
    val data = Seq(("a", 1.0), ("a", 2.0), ("b", 10.0), ("b", 20.0), ("b", 30.0))
    val agg = zip2(
      new CountAll[(String, Double)](),
      contramap((t: (String, Double)) => t._2, new KahanSum[Double](identity)))
    val got = data.toDS().groupByKey(_._1).agg(agg.toColumn.name("cs"))
      .collect().toMap
    assert(got == Map("a" -> ((2L, 3.0)), "b" -> ((3L, 60.0))))
  }

  test("per-key reservoir: exact capped size, sampled ids belong to the key") {
    import spark.implicits._
    val data = (0 until 500).map(i => (s"k${i % 3}", i.toLong))
    val agg = contramap((t: (String, Long)) => t._2, new SampleUnstable[Long](7, 99L))
    val got = data.toDS().repartition(8).groupByKey(_._1)
      .agg(agg.toColumn.name("sample")).collect().toMap
    val byKey = data.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet == byKey.keySet)
    got.foreach { case (k, sample) =>
      assert(sample.length == math.min(7, byKey(k).size))
      assert(sample.distinct.length == sample.length, s"dup in sample for $k")
      assert(sample.forall(byKey(k).contains), s"foreign id sampled for $k")
    }
  }
}
