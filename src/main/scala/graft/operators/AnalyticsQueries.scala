package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series / snapshot analytics gate pack: EWMA smoothing, calendar
  * gap-fill, z-score anomaly census, SCD type-2 history, snapshot diff.
  * Every query carries a DuckDB oracle (hash-verified by the driver).
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- Windowed EWMA per user (α=0.3, 20-row window), final value -------
    // Quantized mode: weighted terms snapped to 1e-6 and summed as BIGINT
    // micro-units, so the sum is order-independent and engine-replayable.
    // ewmaLast: the keep-last-row query shape computes the EWMA once per
    // user over the trailing 20 rows instead of once per EVENT (the
    // former ewmaWindowed + count + row_number composition ran the
    // O(win) weighted aggregate on every row and threw all but one
    // away); result-identical (spec-pinned + same oracle), same single
    // user-keyed exchange.
    "c03_ewma" -> ((s, d) =>
      Analytics.ewmaLast(Tables.events(s, d), Seq("user_id"),
          Seq("ts", "event_id"), "value", alpha = 0.3, win = 20,
          quantized = true)
        .select(col("user_id"), col("n_events"), col("ewma"))
        .orderBy(col("user_id"))),

    // -- Calendar gap-fill: per-user day grid, forward-filled daily cents --
    // Integer cents make every aggregate exact; the grid is generated
    // per key (narrow sequence), forward-fill is one per-key window.
    "c04_gap_fill" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id") < 40)
        .withColumn("cents", floor(col("value") * 100 + lit(0.5)).cast("long"))
      Analytics.gapFillDaily(ev, "user_id", "ts", "cents")
        .select(col("user_id"), col("day"),
          col("filled_value").as("filled_cents"), col("observed"))
        .orderBy(col("user_id"), col("day"))
    }),

    // -- MULTI-TOUCH ATTRIBUTION: first/last/linear revenue credit ------
    // One attribution frame (user-keyed window join) feeds all three
    // models: first-touch and last-touch counts/cents plus exact linear
    // shares in integer micro-cents (cents·10⁶ div n — no float drift).
    // Conversions with no touch in the 7-day lookback surface as
    // '(direct)' with full credit, never silently dropped.
    "c16_attribution" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val k = regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long")
      Analytics.touchAttribution(ev, "user_id", "ts", "event_id",
          col("event_type").isin("view", "click"),
          col("event_type") === "purchase",
          concat(lit("ch"), (k % 4).cast("string")), "value",
          lookbackUs = 604800000000L)
        .withColumn("cents", floor(col("value") * 100 + lit(0.5)).cast("long"))
        .withColumn("ch", coalesce(col("channel"), lit("(direct)")))
        .withColumn("isf", col("is_first") || col("n_touches") === 0)
        .withColumn("isl", col("is_last") || col("n_touches") === 0)
        .withColumn("share",
          when(col("n_touches") === 0, col("cents") * lit(1000000L))
            .otherwise(expr("cents * 1000000 div n_touches")))
        .groupBy(col("ch"))
        .agg(sum(when(col("isf"), lit(1L)).otherwise(lit(0L))).as("n_first"),
          sum(when(col("isf"), col("cents")).otherwise(lit(0L))).as("first_cents"),
          sum(when(col("isl"), col("cents")).otherwise(lit(0L))).as("last_cents"),
          sum(col("share")).as("linear_micro"))
        .orderBy(col("ch"))
    }),

    // -- EXACT-MOMENT Pearson correlation: r(value, hour-of-day) per
    // event type from five INTEGER moment sums (cents × hour) — the
    // order-independent, engine-exact form of corr(); the only doubles
    // are the final closed-form combination -----------------------------
    "c19_correlation" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("x", floor(col("value") * 100 + lit(0.5)).cast("long"))
        .withColumn("y", hour(col("ts")).cast("long"))
      ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("event_type"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
            .as("pearson_r"))
        .orderBy(col("event_type"))
    }),

    // -- SEASONAL-NAIVE forecast backtest: ŷ(day) = y(day−7) per event
    // type over daily cents; MAE + signed bias over every scored day —
    // the baseline forecaster and week-over-week anomaly monitor --------
    "c18_seasonal_backtest" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("cents", floor(col("value") * 100 + lit(0.5)).cast("long"))
      Analytics.seasonalNaiveBacktest(ev, "event_type", "ts", "cents",
          seasonDays = 7)
        .orderBy(col("event_type"))
    }),

    // -- BENFORD first-digit profile: forensic data-quality check on the
    // order-value feed — digit from the cents integer's decimal string
    // (exact in any engine; log10-derived digits flip on libm ulps at
    // power-of-ten boundaries), observed vs log10(1+1/d) expectation
    // with per-digit chi-square contributions --------------------------
    "c17_benford" -> ((s, d) =>
      Checks.benfordProfile(Tables.orders(s, d), "o_totalprice")),

    // -- z-score anomaly census per event type (|z| > 2.5, population σ) --
    "c05_zscore" -> ((s, d) => {
      val flagged = Analytics.zscoreAnomalies(Tables.events(s, d),
        "event_type", "value", z = 2.5)
      flagged.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"),
          sum(col("is_anomaly").cast("long")).as("n_anomalies"),
          round(max(abs(col("zscore"))), 4).as("max_abs_z"))
        .orderBy(col("event_type"))
    }),

    // -- rolling 1-hour RANGE-frame aggregates per user: census over the
    // trailing-count distribution + exact cents checksum ------------------
    "c07_rolling_1h" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("cents", floor(col("value") * 100 + lit(0.5)).cast("long"))
      Analytics.rollingWindow(ev, Seq("user_id"), "ts", "cents",
          windowUs = 3600000000L)
        .groupBy(col("roll_n"))
        .agg(count(lit(1)).as("n_events"), sum(col("roll_sum")).as("sum_cents"))
        .orderBy(col("roll_n"))
    }),

    // -- ordered conversion funnel view→click→purchase within 7 days:
    // greedy-earliest stage matching, depth histogram + t1 checksum ------
    "c08_funnel" -> ((s, d) =>
      Analytics.windowFunnel(Tables.events(s, d), Seq("user_id"), "ts",
          Seq(col("event_type") === "view", col("event_type") === "click",
            col("event_type") === "purchase"),
          horizonUs = 604800000000L)
        .groupBy(col("depth"))
        .agg(count(lit(1)).as("n_users"), sum(col("t_1")).as("sum_t1_us"))
        .orderBy(col("depth"))),

    // -- RFM segmentation: per-customer Recency/Frequency/Monetary
    // quartiles (ntile with unique tiebreak), segment census -----------
    "c15_rfm_segments" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val rfm = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("freq"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val seg = rfm
        .withColumn("r", ntile(4).over(
          Window.orderBy(col("last_order").desc, col("o_custkey"))))
        .withColumn("f", ntile(4).over(
          Window.orderBy(col("freq").desc, col("o_custkey"))))
        .withColumn("m", ntile(4).over(
          Window.orderBy(col("cents").desc, col("o_custkey"))))
      seg.groupBy(col("r"), col("f"), col("m"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("cents")).as("segment_cents"))
        .orderBy(col("r"), col("f"), col("m"))
    }),

    // -- daily percentile bands: p50/p90/p99 of event value per day —
    // the latency-band time series; exact interpolating percentiles ----
    "c14_percentile_bands" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(value, 0.5)"), 4).as("p50"),
          round(expr("percentile(value, 0.9)"), 4).as("p90"),
          round(expr("percentile(value, 0.99)"), 4).as("p99"))
        .orderBy(col("day"))
    }),

    // -- weekday seasonality profile: per-day-of-week volume and its
    // index vs the uniform expectation (the load-shaping signal) -------
    "c13_seasonality" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val byDow = ev.groupBy(dayofweek(col("ts")).as("dow"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("value") * 100 + lit(0.5)).cast("long")).as("cents"))
      val tot = ev.agg(count(lit(1)).as("n_tot"))
      byDow.crossJoin(broadcast(tot))
        .select(col("dow"), col("n"), col("cents"),
          round(floor(col("n") * lit(7.0) / col("n_tot") * lit(1e12) +
            lit(0.5)) / lit(1e12), 6).as("idx"))
        .orderBy(col("dow"))
    }),

    // -- A/B experiment analysis: per-user conversion (any purchase),
    // arms by user parity, two-proportion z-test with pooled variance —
    // exact integer counts, one fixed-order formula, fully replayed ----
    "c12_ab_test" -> ((s, d) => {
      val users = Tables.events(s, d).groupBy(col("user_id"))
        .agg(max((col("event_type") === "purchase").cast("long")).as("conv"))
        .withColumn("is_a", (col("user_id") % 2 === 0).cast("long"))
      val g = users.agg(
        sum(col("is_a")).as("n_a"),
        sum(col("is_a") * col("conv")).as("c_a"),
        sum(lit(1L) - col("is_a")).as("n_b"),
        sum((lit(1L) - col("is_a")) * col("conv")).as("c_b"))
      val pA = col("c_a").cast("double") / col("n_a")
      val pB = col("c_b").cast("double") / col("n_b")
      val pool = (col("c_a") + col("c_b")).cast("double") /
        (col("n_a") + col("n_b"))
      val z = (pA - pB) / sqrt(pool * (lit(1.0) - pool) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
      g.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        round(floor(pA * lit(1e12) + lit(0.5)) / lit(1e12), 6).as("p_a"),
        round(floor(pB * lit(1e12) + lit(0.5)) / lit(1e12), 6).as("p_b"),
        round(floor(z * lit(1e12) + lit(0.5)) / lit(1e12), 6).as("z"),
        (abs(z) > lit(1.96)).as("significant_95"))
    }),

    // -- equal-width numeric histogram: 20 bins over the price range,
    // per-bin count + bounds; one stats pass broadcast back ------------
    "c11_numeric_histogram" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val st = o.agg(min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"))
      o.crossJoin(broadcast(st))
        .withColumn("bin", least(lit(19L),
          floor((col("o_totalprice") - col("mn")) /
            ((col("mx") - col("mn")) / lit(20.0))).cast("long")))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"))
        .orderBy(col("bin"))
    }),

    // -- robust scaling census: median/IQR normalization per event type,
    // outlier count beyond |scaled| > 2 and extremes — all replayed ------
    "c09_robust_scale" -> ((s, d) =>
      Analytics.robustScale(Tables.events(s, d), "event_type", "value")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(min(col("med")), 6).as("med"),
          round(min(col("iqr")), 6).as("iqr"),
          sum((abs(col("scaled")) > 2).cast("long")).as("n_out"),
          round(max(abs(col("scaled"))), 6).as("max_abs_scaled"))
        .orderBy(col("event_type"))),

    // -- SCD type-2 dimension history from the orders changelog -----------
    // One key-partitioned window; versions carry [valid_from, valid_to).
    "u04_scd2" -> ((s, d) => {
      val log = Tables.orders(s, d).filter(col("o_custkey") < 50).select(
        col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"),
        col("o_orderdate").as("change_ts"), col("o_orderstatus").as("status"))
      Analytics.scd2(log, Seq("custkey"), Seq("change_ts", "orderkey"))
        .select(col("custkey"), col("orderkey"), col("status"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy(col("custkey"), col("valid_from"), col("orderkey"))
    }),

    // -- POINT-IN-TIME join against the SCD2 history: each order asks
    // "what was this customer's status the day BEFORE I was placed" —
    // matching the version with valid_from <= t < valid_to and never a
    // later one (the temporal-leakage bug PIT joins exist to prevent);
    // first orders surface null, not dropped ----------------------------
    "u13_pit_join" -> ((s, d) => {
      val log = Tables.orders(s, d).filter(col("o_custkey") < 50).select(
        col("o_custkey").as("custkey"), col("o_orderkey").as("orderkey"),
        col("o_orderdate").as("change_ts"), col("o_orderstatus").as("status"))
      val dim = Analytics.scd2(log, Seq("custkey"), Seq("change_ts", "orderkey"))
      val facts = log.select(col("custkey"), col("orderkey"),
        (col("change_ts") - expr("INTERVAL 1 DAYS")).as("ts"))
      Joins.pitJoin(facts, dim, "custkey", "ts", Seq("status", "orderkey"))
        .select(col("custkey"), col("orderkey"),
          col("pit_match.status").as("prev_status"),
          col("pit_match.orderkey").as("prev_orderkey"))
        .orderBy(col("custkey"), col("orderkey"))
    }),

    // -- Snapshot diff: per-customer latest order, mid-1997 vs final ------
    // full outer on the key; added/removed/changed/unchanged census with
    // a key checksum per class.
    "u05_snapshot_diff" -> ((s, d) => {
      val o = Tables.orders(s, d).select(
        col("o_custkey").as("custkey"), col("o_orderdate").as("dt"),
        col("o_orderkey").as("okey"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      def latest(df: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("custkey"))
          .orderBy(col("dt").desc, col("okey").desc)
        df.withColumn("_rk", row_number().over(w)).filter(col("_rk") === 1)
          .select(col("custkey"), col("status"), col("cents"))
      }
      val cut = lit("1997-07-01").cast("timestamp")
      Analytics.snapshotDiff(
          latest(o.filter(col("dt") < cut)), latest(o),
          Seq("custkey"), Seq("status", "cents"))
        .groupBy(col("diff_status")).agg(
          count(lit(1)).as("n"), sum(col("custkey")).as("key_checksum"))
        .orderBy(col("diff_status"))
    }))

  val oracles: Map[String, String] = Map(
    "c03_ewma" ->
      """WITH e AS (SELECT user_id, ts, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |s AS (SELECT r.user_id, r.rn, r.n,
        |    sum(CAST(floor(s.value * pow(0.7, r.rn - s.rn) * 1e6 + 0.5)
        |      AS BIGINT)) AS num_micro,
        |    least(r.rn, 20) AS m
        |  FROM e r JOIN e s ON s.user_id = r.user_id
        |    AND s.rn BETWEEN r.rn - 19 AND r.rn
        |  GROUP BY r.user_id, r.rn, r.n)
        |SELECT user_id, n AS n_events,
        |  round(num_micro / 1e6 / ((1 - pow(0.7, m)) / 0.3), 4) AS ewma
        |FROM s WHERE rn = n ORDER BY user_id""".stripMargin,
    "c04_gap_fill" ->
      """WITH ev AS (SELECT user_id, ts,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events WHERE user_id < 40),
        |daily AS (SELECT user_id, date_trunc('day', ts) AS day,
        |    CAST(sum(cents) AS BIGINT) AS day_value
        |  FROM ev GROUP BY 1, 2),
        |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
        |  FROM daily GROUP BY 1),
        |grid AS (SELECT user_id,
        |    unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
        |  FROM span)
        |SELECT g.user_id, g.day,
        |  last_value(daily.day_value IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_cents,
        |  daily.day_value IS NOT NULL AS observed
        |FROM grid g LEFT JOIN daily
        |  ON daily.user_id = g.user_id AND daily.day = g.day
        |ORDER BY g.user_id, g.day""".stripMargin,
    "c05_zscore" ->
      """WITH st AS (SELECT event_type, avg(value) AS mu,
        |    stddev_pop(value) AS sigma, count(*) AS n
        |  FROM events GROUP BY 1),
        |z AS (SELECT e.event_type, st.n,
        |    CASE WHEN st.sigma > 0
        |      THEN floor((e.value - st.mu) / st.sigma * 1e12 + 0.5) / 1e12
        |      ELSE 0.0 END AS zscore
        |  FROM events e JOIN st USING (event_type))
        |SELECT event_type, min(n) AS n,
        |  CAST(sum(CASE WHEN abs(zscore) > 2.5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_anomalies,
        |  round(max(abs(zscore)), 4) AS max_abs_z
        |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin,
    "c15_rfm_segments" ->
      """WITH rfm AS (SELECT o_custkey, max(o_orderdate) AS last_order,
        |    count(*) AS freq,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |seg AS (SELECT *,
        |    CAST(ntile(4) OVER (ORDER BY last_order DESC, o_custkey) AS INT)
        |      AS r,
        |    CAST(ntile(4) OVER (ORDER BY freq DESC, o_custkey) AS INT) AS f,
        |    CAST(ntile(4) OVER (ORDER BY cents DESC, o_custkey) AS INT) AS m
        |  FROM rfm)
        |SELECT r, f, m, count(*) AS n_customers,
        |  CAST(sum(cents) AS BIGINT) AS segment_cents
        |FROM seg GROUP BY r, f, m ORDER BY r, f, m""".stripMargin,
    "c14_percentile_bands" ->
      """SELECT date_trunc('day', ts) AS day, count(*) AS n,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.9), 4) AS p90,
        | round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    // Spark dayofweek: Sunday=1..Saturday=7; DuckDB strftime %w: Sunday=0
    "c13_seasonality" ->
      """WITH e AS (SELECT CAST(strftime(ts, '%w') AS INT) + 1 AS dow,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
        |t AS (SELECT count(*) AS n_tot FROM e)
        |SELECT dow, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents,
        |  round(floor(count(*) * 7.0 / t.n_tot * 1e12 + 0.5) / 1e12, 6) AS idx
        |FROM e CROSS JOIN t GROUP BY dow, t.n_tot ORDER BY dow""".stripMargin,
    "c12_ab_test" ->
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_a
        |  FROM events GROUP BY user_id),
        |g AS (SELECT CAST(sum(is_a) AS BIGINT) AS n_a,
        |    CAST(sum(is_a * conv) AS BIGINT) AS c_a,
        |    CAST(sum(1 - is_a) AS BIGINT) AS n_b,
        |    CAST(sum((1 - is_a) * conv) AS BIGINT) AS c_b
        |  FROM u),
        |f AS (SELECT *,
        |    CAST(c_a AS DOUBLE) / n_a AS pa, CAST(c_b AS DOUBLE) / n_b AS pb,
        |    CAST(c_a + c_b AS DOUBLE) / (n_a + n_b) AS pool
        |  FROM g)
        |SELECT n_a, c_a, n_b, c_b,
        |  round(floor(pa * 1e12 + 0.5) / 1e12, 6) AS p_a,
        |  round(floor(pb * 1e12 + 0.5) / 1e12, 6) AS p_b,
        |  round(floor((pa - pb) / sqrt(pool * (1.0 - pool)
        |    * (1.0 / n_a + 1.0 / n_b)) * 1e12 + 0.5) / 1e12, 6) AS z,
        |  abs((pa - pb) / sqrt(pool * (1.0 - pool)
        |    * (1.0 / n_a + 1.0 / n_b))) > 1.96 AS significant_95
        |FROM f""".stripMargin,
    "c11_numeric_histogram" ->
      """WITH st AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |  FROM orders),
        |b AS (SELECT o_totalprice,
        |    least(19, CAST(floor((o_totalprice - st.mn)
        |      / ((st.mx - st.mn) / 20.0)) AS BIGINT)) AS bin
        |  FROM orders CROSS JOIN st)
        |SELECT bin, count(*) AS n, round(min(o_totalprice), 2) AS lo,
        |  round(max(o_totalprice), 2) AS hi
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin,
    "c09_robust_scale" ->
      """WITH st AS (SELECT event_type,
        |    quantile_cont(value, 0.5) AS med,
        |    quantile_cont(value, 0.75) - quantile_cont(value, 0.25) AS iqr
        |  FROM events GROUP BY 1),
        |sc AS (SELECT e.event_type, st.med, st.iqr,
        |    CASE WHEN st.iqr > 0
        |      THEN floor((e.value - st.med) / st.iqr * 1e12 + 0.5) / 1e12
        |      ELSE 0.0 END AS scaled
        |  FROM events e JOIN st USING (event_type))
        |SELECT event_type, count(*) AS n,
        |  round(min(med), 6) AS med, round(min(iqr), 6) AS iqr,
        |  CAST(sum(CASE WHEN abs(scaled) > 2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_out,
        |  round(max(abs(scaled)), 6) AS max_abs_scaled
        |FROM sc GROUP BY event_type ORDER BY event_type""".stripMargin,
    // c19: same integer moments, same closed-form combination
    "c19_correlation" ->
      """WITH e AS (SELECT event_type,
        |    CAST(floor(value*100 + 0.5) AS BIGINT) AS x,
        |    CAST(extract(hour FROM ts) AS BIGINT) AS y FROM events),
        |a AS (SELECT event_type, count(*) AS n,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(x*x) AS BIGINT) AS sxx,
        |  CAST(sum(y*y) AS BIGINT) AS syy
        | FROM e GROUP BY 1)
        |SELECT event_type, n,
        | round((n*sxy - sx*sy)::DOUBLE /
        |   sqrt((n*sxx - sx*sx)::DOUBLE * (n*syy - sy*sy)::DOUBLE), 6)
        |   AS pearson_r
        |FROM a ORDER BY event_type""".stripMargin,
    // c18: same daily aggregate + 7-day self-join; integer error sums;
    // calendar DATE + 7 on both engines (not a day-time interval — see
    // Analytics.seasonalNaiveBacktest's DST note)
    "c18_seasonal_backtest" ->
      """WITH daily AS (SELECT event_type AS k, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(floor(value*100 + 0.5) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT a.k, a.day, a.y, b.y AS yhat
        |  FROM daily a JOIN daily b
        |    ON a.k = b.k AND b.day + 7 = a.day)
        |SELECT k AS event_type, count(*) AS n_scored,
        | CAST(sum(abs(y - yhat)) AS BIGINT) AS abs_err_cents,
        | CAST(sum(y - yhat) AS BIGINT) AS bias_cents,
        | round(sum(abs(y - yhat))::DOUBLE / count(*), 4) AS mae_cents
        |FROM j GROUP BY k ORDER BY event_type""".stripMargin,
    // c17: digit from the cents string — identical extraction; the only
    // doubles are one division and the log10 expectation, round4-stable
    "c17_benford" ->
      """WITH d AS (SELECT CAST(substr(
        |    (CAST(floor(o_totalprice*100 + 0.5) AS BIGINT))::VARCHAR, 1, 1)
        |    AS INT) AS digit
        |  FROM orders WHERE floor(o_totalprice*100 + 0.5) > 0),
        |g AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
        |SELECT digit, CAST(n AS BIGINT) AS n,
        | round(n::DOUBLE / total, 4) AS obs_p,
        | round(log10(1.0 + 1.0 / digit), 4) AS benford_p,
        | round(pow(n::DOUBLE - total * log10(1.0 + 1.0/digit), 2)
        |   / (total * log10(1.0 + 1.0/digit)), 4) AS chi2_part
        |FROM g, t ORDER BY digit""".stripMargin,
    // c16: full relational replay of the attribution frame — epoch_us
    // comparisons (Spark truncates ns→us at load), window row_numbers
    // for first/last, integer floor-division linear shares. A left-join
    // miss is a singleton per conv_id, so its row_number is 1 regardless
    // of engine null-ordering defaults
    "c16_attribution" ->
      """WITH t AS (SELECT user_id AS u, epoch_us(ts) AS t_us, event_id AS t_id,
        |    'ch' || (CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) % 4)
        |      AS channel
        |  FROM events WHERE event_type IN ('view','click')),
        |c AS (SELECT user_id AS u, epoch_us(ts) AS c_us, event_id AS conv_id,
        |    value FROM events WHERE event_type = 'purchase'),
        |j AS (SELECT c.conv_id, c.value, t.channel, t.t_us, t.t_id
        |      FROM c LEFT JOIN t ON c.u = t.u AND t.t_us < c.c_us
        |        AND t.t_us >= c.c_us - 604800000000),
        |r AS (SELECT conv_id, value, channel, t_id,
        |        count(t_id) OVER (PARTITION BY conv_id) AS n,
        |        row_number() OVER (PARTITION BY conv_id
        |          ORDER BY t_us, t_id) AS rf,
        |        row_number() OVER (PARTITION BY conv_id
        |          ORDER BY t_us DESC, t_id DESC) AS rl
        |      FROM j),
        |x AS (SELECT coalesce(channel, '(direct)') AS ch,
        |        CAST(floor(value*100 + 0.5) AS BIGINT) AS cents, n,
        |        ((t_id IS NOT NULL AND rf = 1) OR n = 0) AS isf,
        |        ((t_id IS NOT NULL AND rl = 1) OR n = 0) AS isl,
        |        CASE WHEN n = 0
        |          THEN CAST(floor(value*100+0.5) AS BIGINT) * 1000000
        |          ELSE (CAST(floor(value*100+0.5) AS BIGINT) * 1000000) // n
        |        END AS share
        |      FROM r)
        |SELECT ch,
        | CAST(sum(CASE WHEN isf THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
        | CAST(sum(CASE WHEN isf THEN cents ELSE 0 END) AS BIGINT) AS first_cents,
        | CAST(sum(CASE WHEN isl THEN cents ELSE 0 END) AS BIGINT) AS last_cents,
        | CAST(sum(share) AS BIGINT) AS linear_micro
        |FROM x GROUP BY ch ORDER BY ch""".stripMargin,
    "c07_rolling_1h" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us,
        |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
        |  FROM events),
        |r AS (SELECT user_id, count(*) OVER w AS roll_n,
        |    CAST(sum(cents) OVER w AS BIGINT) AS roll_sum
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us
        |    RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW))
        |SELECT roll_n, count(*) AS n_events,
        |  CAST(sum(roll_sum) AS BIGINT) AS sum_cents
        |FROM r GROUP BY roll_n ORDER BY roll_n""".stripMargin,
    "c08_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |s1 AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN us END) AS t1
        |  FROM e GROUP BY 1),
        |f1 AS (SELECT * FROM s1 WHERE t1 IS NOT NULL),
        |s2 AS (SELECT e.user_id, min(f1.t1) AS t1,
        |    min(CASE WHEN e.event_type = 'click' AND e.us >= f1.t1
        |      AND e.us <= f1.t1 + 604800000000 THEN e.us END) AS t2
        |  FROM e JOIN f1 USING (user_id) GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(s2.t1) AS t1, min(s2.t2) AS t2,
        |    min(CASE WHEN e.event_type = 'purchase' AND e.us >= s2.t2
        |      AND e.us <= s2.t1 + 604800000000 THEN e.us END) AS t3
        |  FROM e JOIN s2 USING (user_id) GROUP BY 1),
        |d AS (SELECT user_id, t1,
        |    CASE WHEN t2 IS NOT NULL AND t3 IS NOT NULL THEN 3
        |      WHEN t2 IS NOT NULL THEN 2 ELSE 1 END AS depth
        |  FROM s3)
        |SELECT depth, count(*) AS n_users,
        |  CAST(sum(t1) AS BIGINT) AS sum_t1_us
        |FROM d GROUP BY depth ORDER BY depth""".stripMargin,
    // u13: same SCD2 versioning (lead over (change_ts, orderkey)), same
    // [valid_from, valid_to) interval predicate, left join
    "u13_pit_join" ->
      """WITH log AS (SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        |    o_orderdate AS change_ts, o_orderstatus AS status
        |  FROM orders WHERE o_custkey < 50),
        |v AS (SELECT custkey, orderkey, status, change_ts AS valid_from,
        |    lead(change_ts) OVER (PARTITION BY custkey
        |      ORDER BY change_ts, orderkey) AS valid_to
        |  FROM log),
        |f AS (SELECT custkey, orderkey,
        |    change_ts - INTERVAL 1 DAY AS ts FROM log)
        |SELECT f.custkey, f.orderkey, v.status AS prev_status,
        |  v.orderkey AS prev_orderkey
        |FROM f LEFT JOIN v ON f.custkey = v.custkey
        |  AND f.ts >= v.valid_from
        |  AND (v.valid_to IS NULL OR f.ts < v.valid_to)
        |ORDER BY f.custkey, f.orderkey""".stripMargin,
    "u04_scd2" ->
      """WITH log AS (SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        |    o_orderdate AS change_ts, o_orderstatus AS status
        |  FROM orders WHERE o_custkey < 50)
        |SELECT custkey, orderkey, status, change_ts AS valid_from,
        |  lead(change_ts) OVER (PARTITION BY custkey
        |    ORDER BY change_ts, orderkey) AS valid_to,
        |  lead(change_ts) OVER (PARTITION BY custkey
        |    ORDER BY change_ts, orderkey) IS NULL AS is_current
        |FROM log ORDER BY custkey, valid_from, orderkey""".stripMargin,
    "u05_snapshot_diff" ->
      """WITH o AS (SELECT o_custkey AS custkey, o_orderdate AS dt,
        |    o_orderkey AS okey, o_orderstatus AS status,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |s_old AS (SELECT custkey, status, cents FROM (
        |    SELECT *, row_number() OVER (PARTITION BY custkey
        |      ORDER BY dt DESC, okey DESC) AS rk
        |    FROM o WHERE dt < TIMESTAMP '1997-07-01') WHERE rk = 1),
        |s_new AS (SELECT custkey, status, cents FROM (
        |    SELECT *, row_number() OVER (PARTITION BY custkey
        |      ORDER BY dt DESC, okey DESC) AS rk FROM o) WHERE rk = 1),
        |j AS (SELECT coalesce(s_old.custkey, s_new.custkey) AS custkey,
        |    CASE WHEN s_old.custkey IS NULL THEN 'added'
        |      WHEN s_new.custkey IS NULL THEN 'removed'
        |      WHEN s_old.status IS DISTINCT FROM s_new.status
        |        OR s_old.cents IS DISTINCT FROM s_new.cents THEN 'changed'
        |      ELSE 'unchanged' END AS diff_status
        |  FROM s_old FULL OUTER JOIN s_new ON s_old.custkey = s_new.custkey)
        |SELECT diff_status, count(*) AS n,
        |  CAST(sum(custkey) AS BIGINT) AS key_checksum
        |FROM j GROUP BY 1 ORDER BY diff_status""".stripMargin)
}
