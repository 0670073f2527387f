package graft

import graft.operators.Joins
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** As-of / range join semantics vs hand-computed truth, and bucketed ==
  * plain equivalence. */
class JoinsSpec extends AnyFunSuite with CacheHygiene {

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  import spark.implicits._

  private def ts(s0: String) = java.sql.Timestamp.valueOf(s0)

  test("asofJoinBackward: latest right <= left time, equal-instant matches, null when none") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:00:00")),
      (3L, "u2", ts("2024-01-01 09:00:00")),   // before any right row -> null
      (4L, "u2", ts("2024-01-01 11:30:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, "u1", ts("2024-01-01 09:55:00")),
      (102L, "u1", ts("2024-01-01 10:00:00")),  // equal instant to left#1
      (103L, "u1", ts("2024-01-01 11:59:00")),
      (104L, "u2", ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = Joins.asofJoinBackward(left, right, "user_id", "ts", "ts", Seq("event_id"))
      .select(col("event_id"), col("asof.event_id").as("m"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(
      1L -> Some(102L), // equal instant preferred over 09:55
      2L -> Some(103L),
      3L -> None,
      4L -> Some(104L)))
  }

  test("rangeJoinBucketed == rangeJoinPlain on real events (sf0.001)") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = e.filter(col("event_type") === "click").select(col("user_id"), col("ts"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("range_match.ts").as("cts"))
        .as[(Long, java.sql.Timestamp)].collect().toSet
    val bucketed = pairs(Joins.rangeJoinBucketed(p, c, "user_id", "ts", "ts", 3600, 0, Seq.empty))
    val plain = pairs(Joins.rangeJoinPlain(p, c, "user_id", "ts", "ts", 3600, 0, Seq.empty))
    assert(bucketed == plain, s"bucketed missing ${plain -- bucketed}, extra ${bucketed -- plain}")
    assert(plain.nonEmpty, "no pairs at all — fixture too small?")
  }

  test("asofJoinBackward equals brute-force reference on random data (property)") {
    val rnd = new scala.util.Random(2024)
    (0 until 3).foreach { trial =>
      val left = (0 until 150).map(i =>
        (i.toLong, s"u${rnd.nextInt(8)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
      val right = (0 until 150).map(i =>
        (1000L + i, s"u${rnd.nextInt(8)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
      val got = Joins.asofJoinBackward(
          left.toDF("event_id", "user_id", "ts"),
          right.toDF("event_id", "user_id", "ts"),
          "user_id", "ts", "ts", Seq("event_id"))
        .select(col("event_id"), col("asof.ts").as("mts"))
        .as[(Long, Option[java.sql.Timestamp])].collect().toMap
      // brute force: per left row, max right ts <= left ts for same key.
      // (tie-break on right event_id is unspecified; compare matched TIME)
      val truth = left.map { case (id, k, t) =>
        val cand = right.filter(r => r._2 == k && !r._3.after(t)).map(_._3)
        id -> (if (cand.isEmpty) None else Some(cand.max))
      }.toMap
      assert(got == truth, s"trial $trial mismatch")
    }
  }

  test("asofJoinNative: same hand-computed truth as the window twin") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 12:00:00")),
      (3L, "u2", ts("2024-01-01 09:00:00")),
      (4L, "u2", ts("2024-01-01 11:30:00"))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, "u1", ts("2024-01-01 09:55:00")),
      (102L, "u1", ts("2024-01-01 10:00:00")),
      (103L, "u1", ts("2024-01-01 11:59:00")),
      (104L, "u2", ts("2024-01-01 11:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val df = Joins.asofJoinNative(left, right, "user_id", "ts", "ts", Seq("event_id"))
    val plan = df.queryExecution.executedPlan.toString
    // physical nodeName strips the Exec suffix: "AsofJoin [keys...]"
    assert(plan.contains("AsofJoin ["), s"native exec not planned:\n$plan")
    assert(!plan.contains("Window"), s"fell back to the window twin:\n$plan")
    val got = df.select(col("event_id"), col("asof.event_id").as("m"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(102L), 2L -> Some(103L), 3L -> None, 4L -> Some(104L)))
  }

  test("asofJoinNative equals window twin on random data, incl. self-join source") {
    val rnd = new scala.util.Random(777)
    (0 until 3).foreach { trial =>
      val left = (0 until 200).map(i =>
        (i.toLong, s"u${rnd.nextInt(7)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
        .toDF("event_id", "user_id", "ts")
      val right = (0 until 200).map(i =>
        (1000L + i, s"u${rnd.nextInt(7)}", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
        .toDF("event_id", "user_id", "ts")
      def res(df: org.apache.spark.sql.DataFrame) =
        df.select(col("event_id"), col("asof.ts").as("mts"))
          .as[(Long, Option[java.sql.Timestamp])].collect().toMap
      val native = res(Joins.asofJoinNative(left, right, "user_id", "ts", "ts", Seq("event_id")))
      val window = res(Joins.asofJoinBackward(left, right, "user_id", "ts", "ts", Seq("event_id")))
      assert(native == window, s"trial $trial native != window twin")
    }
    // both sides carved from the SAME DataFrame (shared attribute ids):
    // exercises the re-alias path the analyzer can't do for a custom node
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)).as("n"), count(col("asof")).as("m"),
        sum(unix_micros(col("asof.ts"))).as("s"))
        .as[(Long, Long, Option[Long])].collect().head
    val nat = agg(Joins.asofJoinNative(p, c, "user_id", "ts", "ts", Seq("event_id")))
    val win = agg(Joins.asofJoinBackward(p, c, "user_id", "ts", "ts", Seq("event_id")))
    assert(nat == win, "self-join-source events mismatch")
  }

  test("asofJoinNative tolerance: boundary inclusive, stale matches degrade to null") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),  // gap 300s -> within
      (2L, "u1", ts("2024-01-01 12:00:00")),  // gap 600s -> exactly at bound
      (3L, "u1", ts("2024-01-01 15:00:00"))   // gap 601s -> stale, null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, "u1", ts("2024-01-01 09:55:00")),
      (102L, "u1", ts("2024-01-01 11:50:00")),
      (103L, "u1", ts("2024-01-01 14:49:59"))
    ).toDF("event_id", "user_id", "ts")
    val got = Joins.asofJoinNative(left, right, "user_id", "ts", "ts",
        Seq("event_id"), tolerance = Some(600L * 1000000L))
      .select(col("event_id"), col("asof.event_id").as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> 101L, 2L -> 102L, 3L -> -1L),
      s"tolerance boundary wrong: $got")
  }

  test("asofJoinNative forward: earliest right >= left, candidate serves many lefts") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),
      (2L, "u1", ts("2024-01-01 10:30:00")),  // same forward candidate as #1
      (3L, "u1", ts("2024-01-01 11:00:00")),  // equal instant matches
      (4L, "u1", ts("2024-01-01 23:00:00")),  // after the last right -> null
      (5L, "u2", ts("2024-01-01 09:00:00"))   // key with no right rows -> null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, "u1", ts("2024-01-01 09:00:00")), // before everything: never forward-matched
      (101L, "u1", ts("2024-01-01 11:00:00")),
      (102L, "u1", ts("2024-01-01 12:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = Joins.asofJoinNative(left, right, "user_id", "ts", "ts",
        Seq("event_id"), direction = "forward")
      .select(col("event_id"), col("asof.event_id").as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> 101L, 2L -> 101L, 3L -> 101L, 4L -> -1L, 5L -> -1L),
      s"forward semantics wrong: $got")
    // forward + tolerance: 30min bound keeps only the equal-instant match
    val tight = Joins.asofJoinNative(left, right, "user_id", "ts", "ts",
        Seq("event_id"), direction = "forward", tolerance = Some(1800L * 1000000L))
      .select(col("event_id"), col("asof.event_id").as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(tight == Map(1L -> -1L, 2L -> 101L, 3L -> 101L, 4L -> -1L, 5L -> -1L),
      s"forward tolerance wrong: $tight")
  }

  test("asofJoinNative forward equals brute-force reference on random data") {
    val rnd = new scala.util.Random(7)
    val lrows = (1 to 400).map(i =>
      (i.toLong, s"u${rnd.nextInt(8)}", rnd.nextInt(10000).toLong))
    val rrows = (1 to 300).map(i =>
      (1000L + i, s"u${rnd.nextInt(8)}", rnd.nextInt(10000).toLong))
    val l = lrows.toDF("id", "k", "t")
    val r = rrows.toDF("id", "k", "t")
    val got = Joins.asofJoinNative(l, r, "k", "t", "t", Seq("id"),
        direction = "forward", tolerance = Some(2000L))
      .select(col("id"), col("asof.id").as("m"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    val byKey = rrows.groupBy(_._2)
    val want = lrows.map { case (id, k, t) =>
      val cands = byKey.getOrElse(k, Nil).filter(c => c._3 >= t && c._3 - t <= 2000L)
      // earliest forward candidate; sort-order tie among equal times is
      // whichever the merge peeks first — avoid ties in this data? ties
      // possible: accept any candidate with the MINIMUM time
      id -> (if (cands.isEmpty) Set(-1L)
             else { val mt = cands.map(_._3).min
               cands.filter(_._3 == mt).map(_._1).toSet })
    }.toMap
    got.foreach { case (id, m) =>
      assert(want(id).contains(m), s"left $id matched $m want one of ${want(id)}")
    }
  }

  test("asofJoinNative nearest: closer side wins, ties to backward, tolerance composes") {
    val left = Seq(
      (1L, "u1", ts("2024-01-01 10:00:00")),  // back 5min vs fwd 50min -> back
      (2L, "u1", ts("2024-01-01 10:40:00")),  // back 45min vs fwd 10min -> fwd
      (3L, "u1", ts("2024-01-01 10:22:30")),  // 27.5min either way -> tie -> back
      (4L, "u2", ts("2024-01-01 09:00:00"))   // only a forward exists -> fwd
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (101L, "u1", ts("2024-01-01 09:55:00")),
      (102L, "u1", ts("2024-01-01 10:50:00")),
      (201L, "u2", ts("2024-01-01 09:30:00"))
    ).toDF("event_id", "user_id", "ts")
    def run(tol: Option[Long]) = Joins.asofJoinNative(left, right,
        "user_id", "ts", "ts", Seq("event_id"),
        direction = "nearest", tolerance = tol)
      .select(col("event_id"), col("asof.event_id").as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(run(None) == Map(1L -> 101L, 2L -> 102L, 3L -> 101L, 4L -> 201L))
    // 20-minute tolerance: the tie row (27.5min both ways) drops out;
    // u2's 30min forward drops out
    assert(run(Some(20L * 60 * 1000000L)) ==
      Map(1L -> 101L, 2L -> 102L, 3L -> -1L, 4L -> -1L))
  }

  test("asofJoinNative nearest equals brute-force reference on random data") {
    val rnd = new scala.util.Random(13)
    val lrows = (1 to 400).map(i =>
      (i.toLong, s"u${rnd.nextInt(8)}", rnd.nextInt(10000).toLong))
    val rrows = (1 to 300).map(i =>
      (1000L + i, s"u${rnd.nextInt(8)}", rnd.nextInt(10000).toLong))
    val got = Joins.asofJoinNative(lrows.toDF("id", "k", "t"),
        rrows.toDF("id", "k", "t"), "k", "t", "t", Seq("id", "t"),
        direction = "nearest")
      .select(col("id"), col("asof.t").as("mt"))
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) Long.MinValue else x.getLong(1))).toMap
    val byKey = rrows.groupBy(_._2)
    lrows.foreach { case (id, k, t) =>
      val cands = byKey.getOrElse(k, Nil)
      if (cands.isEmpty) assert(got(id) == Long.MinValue)
      else {
        val back = cands.map(_._3).filter(_ <= t).maxOption
        val fwd = cands.map(_._3).filter(_ >= t).minOption
        val want = (back, fwd) match {
          case (Some(b), Some(f)) => if (t - b <= f - t) b else f
          case (Some(b), None) => b
          case (None, Some(f)) => f
          case _ => Long.MinValue
        }
        // compare by matched TIME (ties among equal times share it)
        assert(got(id) == want, s"left $id at $t: got ${got(id)} want $want")
      }
    }
  }

  test("asofJoinNative guards: null left time never matches forward; mixed axis types refused") {
    // null left time: forward must yield null, not the earliest right row
    val left = Seq((1L, "u1", Option.empty[java.sql.Timestamp]),
      (2L, "u1", Some(ts("2024-01-01 10:00:00"))))
      .toDF("event_id", "user_id", "ts")
    val right = Seq((101L, "u1", ts("2024-01-01 11:00:00")))
      .toDF("event_id", "user_id", "ts")
    val got = Joins.asofJoinNative(left, right, "user_id", "ts", "ts",
        Seq("event_id"), direction = "forward")
      .select(col("event_id"), col("asof.event_id").as("m"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(got == Map(1L -> -1L, 2L -> 101L),
      s"null left time must not forward-match: $got")
    // mixed time-axis types fail at plan time, not with garbage matches
    val dates = Seq((1L, "u1", java.sql.Date.valueOf("2024-01-01")))
      .toDF("event_id", "user_id", "d")
    intercept[IllegalArgumentException] {
      Joins.asofJoinNative(dates, right, "user_id", "d", "ts",
        Seq("event_id")).collect()
    }
  }

  test("asof null-time boundary: NULL time on either side never matches (all directions + window twin)") {
    // u1: both a null-time and a real-time row on each side; u2: the
    // right side holds ONLY a null-time row. SQL `r.t <= l.t` (or >=)
    // over a NULL yields NULL -> no match; before the r6-verdict fix the
    // merge's null-first natural ordering paired u1's null-time rows.
    val left = Seq(
      (1L, "u1", Option.empty[java.sql.Timestamp]),         // null left time
      (2L, "u1", Some(ts("2024-01-01 10:00:00"))),          // real left time
      (3L, "u2", Some(ts("2024-01-01 10:00:00")))           // only null-time right
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, "u1", Option.empty[java.sql.Timestamp]),       // null right time
      (101L, "u1", Some(ts("2024-01-01 09:00:00"))),
      (200L, "u2", Option.empty[java.sql.Timestamp])
    ).toDF("event_id", "user_id", "ts")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("asof.event_id").as("m"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    for (dir <- Seq("backward", "forward", "nearest")) {
      val want = dir match {
        case "forward" => Map(1L -> -1L, 2L -> -1L, 3L -> -1L) // 09:00 is behind 10:00
        case _         => Map(1L -> -1L, 2L -> 101L, 3L -> -1L)
      }
      val got = res(Joins.asofJoinNative(left, right, "user_id", "ts", "ts",
        Seq("event_id"), direction = dir))
      assert(got == want, s"direction=$dir: $got != $want")
    }
    // tolerance path must not trip on the null candidates either
    val tol = res(Joins.asofJoinNative(left, right, "user_id", "ts", "ts",
      Seq("event_id"), tolerance = Some(2L * 3600 * 1000000L)))
    assert(tol == Map(1L -> -1L, 2L -> 101L, 3L -> -1L), s"tolerance: $tol")
    // window twin agrees with the native operator
    val win = res(Joins.asofJoinBackward(left, right, "user_id", "ts", "ts", Seq("event_id")))
    assert(win == Map(1L -> -1L, 2L -> 101L, 3L -> -1L), s"window twin: $win")
  }

  test("range join boundary: inclusive lower, exclusive upper") {
    val p = Seq((1L, "u", ts("2024-01-01 10:00:00"))).toDF("event_id", "user_id", "ts")
    val c = Seq(
      ("u", ts("2024-01-01 09:00:00")),   // == lower bound -> in
      ("u", ts("2024-01-01 08:59:59")),   // just below -> out
      ("u", ts("2024-01-01 10:00:00")),   // == upper bound -> out
      ("u", ts("2024-01-01 09:59:59"))    // just inside -> in
    ).toDF("user_id", "ts")
    val got = Joins.rangeJoinBucketed(p, c, "user_id", "ts", "ts", 3600, 0, Seq.empty)
      .select(col("range_match.ts")).as[java.sql.Timestamp].collect().toSet
    assert(got == Set(ts("2024-01-01 09:00:00"), ts("2024-01-01 09:59:59")))
  }

  test("pitJoin: interval boundaries, open current version, pre-history nulls") {
    import graft.operators.Analytics
    // key 1 version chain: A from day 1, B from day 3, C (current) from day 5
    val log = Seq(
      (1L, 10L, "2024-01-01 00:00:00", "A"),
      (1L, 11L, "2024-01-03 00:00:00", "B"),
      (1L, 12L, "2024-01-05 00:00:00", "C"))
      .toDF("k", "seq", "tss", "attr")
      .withColumn("change_ts", to_timestamp(col("tss")))
    val dim = Analytics.scd2(log, Seq("k"), Seq("change_ts", "seq"))
    val facts = Seq(
      (1L, 100L, "2023-12-31 23:59:59"), // before history -> null
      (1L, 101L, "2024-01-01 00:00:00"), // exactly valid_from -> A
      (1L, 102L, "2024-01-02 23:59:59"), // last instant of A -> A
      (1L, 103L, "2024-01-03 00:00:00"), // boundary: B starts -> B, NOT A
      (1L, 104L, "2024-01-09 00:00:00"), // open current version -> C
      (2L, 105L, "2024-01-04 00:00:00")) // unknown key -> null
      .toDF("k", "fid", "tss").withColumn("ts", to_timestamp(col("tss")))
    val got = Joins.pitJoin(facts, dim, "k", "ts", Seq("attr"))
      .select(col("fid"), col("pit_match.attr"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1)))
      .toMap
    assert(got == Map(100L -> null, 101L -> "A", 102L -> "A",
      103L -> "B", 104L -> "C", 105L -> null), s"got $got")
    // no fan-out: one output row per fact
    assert(Joins.pitJoin(facts, dim, "k", "ts", Seq("attr")).count() == 6L)
  }
}
