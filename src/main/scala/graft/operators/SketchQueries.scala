package graft.operators

import graft.Tables
import graft.aggregators.SketchAggregators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's sketch sinks (amadeus-streaming) as Spark queries.
  *
  * Queries whose parameters put the sketch in its exact regime (tracked
  * set ≥ true key cardinality) carry DuckDB oracles; genuinely
  * approximate ones are declared without oracle SQL (driver records the
  * weaker rows-only check) and their accuracy is asserted in the
  * ScalaTest/ScalaCheck suites instead.
  */
object SketchQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // -- HyperLogLog sink: approx COUNT(DISTINCT) ------------------------
    "sk01_hll_distinct" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.lineitem(s, d).select(col("l_partkey")).as[Long]
      val agg = new HllDistinct[Long](14, identity)
      ds.select(agg.toColumn.name("approx_parts")).toDF("approx_parts")
    }),

    // -- most_frequent in exact regime (n ≥ distinct keys) ---------------
    "sk02_most_frequent_exact" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.orders(s, d).select(col("o_orderpriority")).as[String]
      val agg = new MostFrequent[String, String](10, 0.99, 0.002, identity)
      ds.select(agg.toColumn.name("top")).toDF("top")
        .select(explode(col("top")).as("kv"))
        .select(col("kv._1").as("o_orderpriority"), col("kv._2").as("n"))
        .orderBy(col("n").desc, col("o_orderpriority"))
    }),

    // -- most_frequent as a true sketch (2000 parts, track 20) -----------
    // Accuracy regime, measured honestly: l_partkey is NEAR-UNIFORM
    // (~20k keys, counts ~30±5 at sf0.1) while the reference params give
    // a CMS tolerance of 0.002·N ≈ ±1200 — the count gaps between ranks
    // are far below sketch noise, so overlap with the exact top-20 is
    // ~chance HERE BY CONSTRUCTION (true of any bounded-memory sketch,
    // including the reference's Top<A,usize>; rows-only gate entry by
    // design). The guarantee that IS provided — and pinned in SketchSpec
    // — is the heavy-hitter regime: ≥19/20 overlap under Zipf(1.1) skew
    // with distributed merge, backed by 4n tracking slack in TopFreq.
    "sk03_most_frequent_sketch" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.lineitem(s, d).select(col("l_partkey")).as[Long]
      val agg = new MostFrequent[Long, Long](20, 0.99, 0.002, identity)
      ds.select(agg.toColumn.name("top")).toDF("top")
        .select(explode(col("top")).as("kv"))
        .select(col("kv._1").as("l_partkey"), col("kv._2").as("n"))
        .orderBy(col("n").desc, col("l_partkey"))
    }),

    // -- sk03b: the SKETCH REGIME itself, hash-verified. sk03 showed why
    // near-uniform data is unrankable by ANY bounded-memory sketch; this
    // gate builds the complementary skewed stream where the ranking IS
    // provable (the reference pins its Top sketch the same way — a
    // synthetic skewed stream with a known answer,
    // /root/reference/amadeus-streaming/src/top.rs:252-291):
    // k = lowest set bit of l_orderkey (geometric: count(rank r) ≈ N/2^r,
    // adjacent ranks separated 2×) for the 10 hot keys, and a long tail
    // of ~N/1024 one-off keys (59 distinct at sf0.01, 594 at sf0.1 —
    // far beyond the tracker's 4n=40 capacity, so promotion/eviction and
    // the CMS tail path all run). CMS tolerance 1e-4 ⇒ max count error
    // ≈ 1e-4·N ≪ the N/2048 gap at rank 10, so the top-10 RANKING is
    // deterministic and replays exactly in DuckDB; per-key counts carry
    // a 0.1%-of-N accuracy contract (gate-enforced bool). ---------------
    "sk03b_most_frequent_skewed" -> ((s, d) => {
      import s.implicits._
      val kExpr = "CASE WHEN (l_orderkey & 1023) <> 0" +
        " THEN (l_orderkey & -l_orderkey) ELSE l_partkey + 1000000 END"
      val stream = Tables.lineitem(s, d).select(expr(kExpr).as("k"))
      val agg = new MostFrequent[Long, Long](10, 0.99, 0.0001, identity)
      val est = stream.as[Long].select(agg.toColumn.name("top")).toDF("top")
        .select(posexplode(col("top")).as(Seq("pos", "kv")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("kv._1").as("k"), col("kv._2").as("est"))
      val exact = stream.groupBy(col("k")).agg(count(lit(1)).as("exact"))
      val tot = stream.agg(count(lit(1)).as("n_total"))
      est.join(exact, Seq("k")).crossJoin(broadcast(tot))
        .select(col("rank"), col("k"),
          (abs(col("est") - col("exact")) <=
            col("n_total").cast("double") * 0.001).as("count_ok"))
        .orderBy(col("rank"))
    }),

    // -- sk03c: the EVICTION path itself replayed EXACTLY (r8 verdict
    // #8, the sk05b constrained-regime discipline). In one partition
    // with a defined order, keys arriving as CONSECUTIVE runs, and
    // pairwise-DISTINCT per-key totals, every Filtered-Space-Saving
    // decision is forced: the conservative CMS estimate of a run-local
    // key is its exact cumulative count (no full-row collisions at this
    // width — deterministic hashes, checked by the hash match itself),
    // promotion fires iff the run total exceeds the unique tracked
    // minimum, and the evicted key is that unique minimum — HashMap
    // iteration order never gets a choice. The final tracked state is
    // therefore a pure fold over (arrival order, totals), which DuckDB
    // replays with a recursive CTE and hash-matches rank, key AND count.
    // The general regime's residual nondeterminism (eviction among TIED
    // minima follows the cache's scan order) is documented in
    // COVERAGE.md; sk03 stays the production rows-only shape. -----------
    "sk03c_most_frequent_replay" -> ((s, d) => {
      import s.implicits._
      // 60 keys, arrival order r = 1..60, totals (r*37 mod 97)+2 — all
      // distinct (37 is invertible mod 97), range 2..98; tracker cap
      // 4n = 20 fills at r=20, so 40 forced promotion decisions run
      val stream = s.range(1, 61)
        .select(col("id").as("r"), (lit(1000) + col("id")).as("k"),
          ((col("id") * 37) % 97 + 2).as("c"))
        .select(col("r"), col("k"),
          explode(sequence(lit(1), col("c"))).as("copy"))
        .repartition(1).sortWithinPartitions(col("r"), col("copy"))
      val agg = new MostFrequent[Long, Long](5, 0.99, 0.002, identity)
      stream.select(col("k")).as[Long]
        .select(agg.toColumn.name("top")).toDF("top")
        .select(posexplode(col("top")).as(Seq("pos", "kv")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("kv._1").as("k"), col("kv._2").as("n"))
        .orderBy(col("rank"))
    }),

    // -- sk04b: mostDistinct's sketch regime, hash-verified the same way:
    // same skewed key stream, value = a per-row-unique composite so the
    // per-key distinct counts inherit the 2× geometric separation —
    // adjacent ranks differ ~100% while the b=8 HLL's 3σ is ~19.5%, so
    // the merged-sketch ranking provably matches the exact replay; each
    // tracked key's estimate additionally carries sk14's 3σ contract. --
    "sk04b_most_distinct_skewed" -> ((s, d) => {
      import s.implicits._
      val kExpr = "CASE WHEN (l_orderkey & 1023) <> 0" +
        " THEN (l_orderkey & -l_orderkey) ELSE l_partkey + 1000000 END"
      val stream = Tables.lineitem(s, d).select(expr(kExpr).as("k"),
        expr("l_orderkey * 10 + l_linenumber").as("v"))
      val agg = new MostDistinct[(Long, Long), Long](
        10, 0.99, 0.002, 0.0808, _._1, _._2)
      val est = stream.as[(Long, Long)]
        .select(agg.toColumn.name("top")).toDF("top")
        .select(posexplode(col("top")).as(Seq("pos", "kv")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("kv._1").as("k"), col("kv._2").as("est"))
      val exact = stream.groupBy(col("k"))
        .agg(countDistinct(col("v")).as("exact"))
      est.join(exact, Seq("k"))
        .select(col("rank"), col("k"),
          (abs(col("est") - col("exact")).cast("double") / col("exact") <=
            3 * 1.04 / 16.0).as("est_ok"))
        .orderBy(col("rank"))
    }),

    // -- sk04c: TopDistinct's eviction path replayed EXACTLY (sk03c's
    // discipline lifted to HLL scores): one partition, defined order,
    // consecutive runs, and per-key value sets whose b=4 HLL estimates
    // are pairwise distinct doubles — promotion fires iff the run's HLL
    // estimate beats the unique tracked minimum, so the fold is forced
    // and the oracle replays it: sk27's register rebuild (splitmix64
    // value hash, idx = h>>60, rank = 65−bitlen((h·16)|8)) feeds the
    // EXACT double estimator (ordered 2^-r fold, alpha·m² left-assoc,
    // linear-counting branch) into a recursive-CTE fold. --------------
    "sk04c_most_distinct_replay" -> ((s, d) => {
      import s.implicits._
      val stream = s.range(1, 61)
        .select(col("id").as("r"), (lit(1000) + col("id")).as("k"),
          (lit(150) + ((col("id") * 37) % 97) * 3).as("c"))
        .select(col("r"), col("k"),
          explode(sequence(lit(0), col("c") - 1)).as("i"))
        .select(col("r"), col("k"), (col("k") * 100000 + col("i")).as("v"))
        .repartition(1).sortWithinPartitions(col("r"), col("v"))
      val agg = new MostDistinct[(Long, Long), Long](
        5, 0.99, 0.002, 0.26, _._1, _._2)
      stream.select(col("k"), col("v")).as[(Long, Long)]
        .select(agg.toColumn.name("top")).toDF("top")
        .select(posexplode(col("top")).as(Seq("pos", "kv")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("kv._1").as("k"), col("kv._2").as("n_distinct"))
        .orderBy(col("rank"))
    }),

    // -- most_distinct: top keys by approx COUNT(DISTINCT custkey) -------
    "sk04_most_distinct" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_custkey")).as[(String, Long)]
      val agg = new MostDistinct[(String, Long), String](
        10, 0.99, 0.002, 0.0808, _._1, _._2)
      ds.select(agg.toColumn.name("top")).toDF("top")
        .select(explode(col("top")).as("kv"))
        .select(col("kv._1").as("o_orderpriority"), col("kv._2").as("n_cust"))
        .orderBy(col("n_cust").desc, col("o_orderpriority"))
    }),

    // -- sample_unstable: exact-k mergeable reservoir --------------------
    "sk05_reservoir_sample" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber")).as[(Long, Int)]
      val agg = new SampleUnstable[(Long, Int)](50, 42L)
      ds.select(agg.toColumn.name("sample")).toDF("sample")
        .select(explode(col("sample")).as("t"))
        .select(col("t._1").as("l_orderkey"), col("t._2").as("l_linenumber"))
    }),

    // -- sk05b: the reservoir made hash-verifiable (the sk25 discipline:
    // constrain the regime until the state is order-independent — here
    // ONE partition, one push per row, in a DEFINED total order). The
    // Vitter eviction is then CLOSED-FORM per row: item i > k draws
    // j = floorMod(mix64(seed ^ mix64(i-k)), i) (the draw counter is
    // exactly i-k), so each slot's final occupant is just the max-i
    // write — no sequential fold. The typed agg's final pass merges the
    // one partial into the zero buffer, which deals the slots into a
    // new order with the counter-keyed stream seeded mix64(seed^seed) =
    // mix64(0); that too is closed-form draws + a 50-step removal.
    // DuckDB replays both halves (UHUGEINT splitmix64 per sk25 + a
    // recursive-CTE deal) and must reproduce every slot EXACTLY —
    // upgrading sample_unstable from rows-only (sk05) to hash-verified.
    "sk05b_reservoir_replay" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber")).as[(Long, Int)]
        .repartition(1)
        .sortWithinPartitions(col("l_orderkey"), col("l_linenumber"))
      val agg = new SampleUnstable[(Long, Int)](50, 42L)
      ds.select(agg.toColumn.name("sample")).toDF("sample")
        .select(posexplode(col("sample")).as(Seq("slot", "t")))
        .select(col("slot").cast("long").as("slot"),
          col("t._1").as("l_orderkey"),
          col("t._2").cast("long").as("l_linenumber"))
        .orderBy(col("slot"))
    }),

    // -- sk28: GK quantile sketch CONTRACT, gate-enforced: the
    // deterministic Greenwald-Khanna summary (the classic mergeable
    // quantile sketch; the reference's streaming crate has none) must
    // answer seven quantiles of l_extendedprice within the documented
    // rank bound under Spark's REAL partial-merge tree. The gate
    // computes each estimate's EXACT rank interval in one aggregate
    // pass and asserts |rank − ⌈q·N⌉| ≤ 2εN + 1 (the additive merge
    // bound; GkSpec pins εN on single streams). Estimates themselves
    // are arrival-order-dependent — like sk05's reservoir — so the
    // asserted booleans are the oracle surface (t15/t16 discipline). --
    "sk28_gk_quantiles_contract" -> ((s, d) => {
      import s.implicits._
      import graft.aggregators.SketchAggregators.ApproxQuantiles
      val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
      val eps = 0.01
      val ds = Tables.lineitem(s, d).select(col("l_extendedprice").as("v"))
        .as[Double]
      val agg = new ApproxQuantiles[Double](eps, qs, identity)
      val ests = ds.select(agg.toColumn.name("qv")).head()
      val exprs = qs.indices.flatMap { i =>
        Seq(sum(when(col("v") < ests(i), 1L).otherwise(0L)).as(s"lt_$i"),
          sum(when(col("v") <= ests(i), 1L).otherwise(0L)).as(s"le_$i"))
      } :+ count(lit(1)).as("n")
      val r = ds.toDF("v").agg(exprs.head, exprs.tail: _*).head()
      val n = r.getLong(2 * qs.size)
      qs.zipWithIndex.map { case (q, i) =>
        val lt = r.getLong(2 * i); val le = r.getLong(2 * i + 1)
        val target = math.max(1L, math.ceil(q * n).toLong)
        val tol = (2 * eps * n).toLong + 1
        val err =
          if (target < lt + 1) lt + 1 - target
          else if (target > le) target - le else 0L
        (q, err <= tol)
      }.toDF("q", "rank_ok").orderBy(col("q"))
    }),

    // -- sk29: PER-KEY GK quantiles (t09/c14's scale twin, r8 verdict #4):
    // exact group percentiles are a per-group sort at 100 TB; the keyed
    // GK aggregate keeps O((1/ε)log(εN)) tuples per group. The gate
    // computes each (group, q) estimate's EXACT rank interval in one
    // joined aggregate pass and asserts |rank − ⌈q·N_g⌉| ≤ 2εN_g + 1
    // PER GROUP (sk28's bound, keyed). Estimates are arrival-order state;
    // the booleans are the oracle surface. ------------------------------
    "sk29_gk_quantiles_by_key" -> ((s, d) => {
      val qs = Seq(0.1, 0.5, 0.9, 0.99)
      val eps = 0.01
      val vals = Tables.lineitem(s, d).select(col("l_returnflag").as("k"),
        col("l_extendedprice").cast("double").as("v"))
      val ests = Analytics.gkQuantilesByKey(vals, Seq("k"), "v", qs, eps)
        .select(col("k"), posexplode(col("quantiles")))
        .withColumnRenamed("pos", "qi").withColumnRenamed("col", "est")
      val checked = vals.join(broadcast(ests), Seq("k"))
        .groupBy(col("k"), col("qi"), col("est"))
        .agg(sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("lt"),
          sum(when(col("v") <= col("est"), 1L).otherwise(0L)).as("le"),
          count(lit(1)).as("n"))
      checked
        .withColumn("q", element_at(lit(qs.toArray), col("qi").cast("int") + 1))
        .withColumn("target",
          greatest(lit(1L), ceil(col("q") * col("n")).cast("long")))
        .withColumn("tol", floor(lit(2 * eps) * col("n")).cast("long") + 1)
        .withColumn("err",
          when(col("target") < col("lt") + 1, col("lt") + 1 - col("target"))
            .when(col("target") > col("le"), col("target") - col("le"))
            .otherwise(lit(0L)))
        .select(col("k"), col("q"), (col("err") <= col("tol")).as("rank_ok"))
        .orderBy(col("k"), col("q"))
    }),

    // -- sk30: the auto quantile dispatcher's OUTPUT, oracle-gated (the
    // d25 discipline — not just the PlanSpec regime flip: the result of
    // whichever regime the census picks must hash-match). At sandbox
    // scale the largest group sits under the ceiling, so the exact
    // interpolating form runs and DuckDB replays it as quantile_cont;
    // the GK regime's bound is sk29's gate. ------------------------------
    "sk30_group_quantiles_auto" -> ((s, d) => {
      val vals = Tables.lineitem(s, d).select(col("l_returnflag").as("k"),
        col("l_extendedprice").cast("double").as("v"))
      Analytics.groupQuantilesAuto(vals, Seq("k"), "v", Seq(0.25, 0.5, 0.9))
        .select(col("k"), posexplode(col("quantiles")))
        .withColumnRenamed("pos", "qi")
        .select(col("k"), col("qi").cast("long").as("qi"),
          round(col("col"), 4).as("qv"))
        .orderBy(col("k"), col("qi"))
    }),

    // -- sort_n_by inside group_by: per-status top-3 orders by price -----
    "sk06_sort_n_by_group" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.orders(s, d)
        .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
        .as[(String, Long, Double)]
      val ord = Ordering.by[(String, Long, Double), (Double, Long)](t => (-t._3, t._2))
      val agg = new SortNBy[(String, Long, Double)](3, ord)
      ds.groupByKey(_._1).agg(agg.toColumn.name("top"))
        .toDF("o_orderstatus", "top")
        .select(col("o_orderstatus"), explode(col("top")).as("t"))
        .select(col("o_orderstatus"), col("t._2").as("o_orderkey"),
          round(col("t._3"), 2).as("price"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    }),

    // -- Kahan mean + Welford stddev (reference mean.rs / stddev.rs) -----
    "sk07_kahan_welford" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.lineitem(s, d).select(col("l_quantity")).as[Double]
      ds.select(
          new KahanMean[Double](identity).toColumn.name("m"),
          new WelfordStddev[Double](identity).toColumn.name("sd"))
        .toDF("m", "sd")
        .select(round(col("m"), 4).as("mean_qty"), round(col("sd"), 4).as("sd_qty"))
    }),

    // -- group_by(sub_sink): aggregator combinators under groupByKey -----
    "sk08_group_sub_sink" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_totalprice")).as[(Long, Double)]
      val agg = zip2(
        new CountAll[(Long, Double)](),
        contramap((t: (Long, Double)) => t._2, new KahanSum[Double](identity)))
      ds.groupByKey(_._1).agg(agg.toColumn.name("cs"))
        .toDF("o_custkey", "cs")
        .select(col("o_custkey"), col("cs._1").as("n_orders"),
          round(col("cs._2"), 2).as("total_spent"))
        .orderBy(col("o_custkey"))
    }),

    // -- per-key reservoir: exact-k uniform sample inside each group -----
    // the reference's sample_unstable is global-only; per-key sampling
    // (cap examples per class/domain) composes the same mergeable
    // Reservoir under groupByKey. Sample CONTENTS depend on partition
    // order (rows-only would be meaningless) — the output is the
    // deterministic shape (group, capped size), contents spec-checked.
    // -- sketch accuracy CONTRACTS, gate-enforced: the HLL estimate and
    // the reservoir members are engine-specific (rows-only as values),
    // but their guarantees are checkable facts — estimate within 3σ of
    // the exact distinct count, reservoir exactly k distinct members all
    // drawn from the population. --------------------------------------
    "sk12_sketch_contracts" -> ((s, d) => {
      import s.implicits._
      val keys = Tables.lineitem(s, d).select(col("l_partkey")).as[Long]
      val est = keys.select(new HllDistinct[Long](14, identity).toColumn).head()
      val exact = keys.distinct().count()
      // b=14 -> relative sigma = 1.04/sqrt(2^14) ≈ 0.81%
      val hllOk = math.abs(est - exact).toDouble / exact <= 3 * 1.04 / math.sqrt(1 << 14)
      // rows are sampled from a multiset (partkeys repeat), so the
      // contract is exact SIZE, not distinctness of values
      val sample = GraftStream(keys).sampleUnstable(50, seed = 11L)
      val resSizeOk = sample.length == 50
      // membership via anti-join (no population collect on the driver)
      val outside = sample.toDF("l_partkey")
        .join(keys.toDF(), Seq("l_partkey"), "left_anti").count()
      Seq((hllOk, resSizeOk, outside == 0L))
        .toDF("hll_ok", "res_size_ok", "res_member_ok")
    }),

    // -- per-key distinct-count CONTRACT, gate-enforced: sk04's RANKING
    // is HLL-noise-sensitive (rows-only), but each tracked key's HLL
    // estimate must sit within 3σ of its exact distinct count; the
    // oracle enumerates the keys so a dropped key also fails -----------
    "sk14_distinct_contract" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_custkey")).as[(String, Long)]
      val agg = new MostDistinct[(String, Long), String](
        10, 0.99, 0.002, 0.0808, _._1, _._2)
      val est = ds.select(agg.toColumn.name("top")).toDF("top")
        .select(explode(col("top")).as("kv"))
        .select(col("kv._1").as("o_orderpriority"), col("kv._2").as("est"))
      val exact = Tables.orders(s, d).groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("exact"))
      // error_rate 0.0808 -> b=8 -> sigma = 1.04/sqrt(256) = 6.5%
      est.join(exact, Seq("o_orderpriority"))
        .select(col("o_orderpriority"),
          (abs(col("est") - col("exact")) / col("exact") <= 3 * 1.04 / 16.0)
            .as("est_ok"))
        .orderBy(col("o_orderpriority"))
    }),

    // -- approx-quantile rank CONTRACT, gate-enforced: the sketch values
    // are engine-specific (sk09 rows-only), but the rank guarantee is a
    // fact — the fraction of rows at or below the approximate pXX must
    // sit within a small margin of XX (GK accuracy 1000 → rank error
    // ≤ 1e-3; margin 0.02 absorbs ties) -------------------------------
    "sk13_quantile_contract" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_extendedprice").as("p"))
      val qs = li.agg(
        expr("approx_percentile(p, 0.5, 1000)").as("a50"),
        expr("approx_percentile(p, 0.95, 1000)").as("a95"))
      li.crossJoin(broadcast(qs))
        .agg(avg(when(col("p") <= col("a50"), 1.0).otherwise(0.0)).as("r50"),
          avg(when(col("p") <= col("a95"), 1.0).otherwise(0.0)).as("r95"))
        .select((col("r50") >= 0.48 && col("r50") <= 0.52).as("p50_rank_ok"),
          (col("r95") >= 0.93 && col("r95") <= 0.97).as("p95_rank_ok"))
    }),

    // -- HLL SET ALGEBRA contract, gate-enforced: union of two customer
    // sets via register-max merge must track the exact distinct union
    // within 3σ, and the inclusion-exclusion intersection estimate within
    // 3σ·(|A|+|B|+|A∪B|) absolute (errors of three estimates compound).
    // Only two 2^14-byte sketches reach the driver ----------------------
    "sk15_hll_setops" -> ((s, d) => {
      import s.implicits._
      val o = Tables.orders(s, d)
      val cut = lit("1997-01-01").cast("timestamp")
      val aKeys = o.filter(col("o_orderdate") < cut)
        .select(col("o_custkey")).as[Long]
      val bKeys = o.filter(col("o_orderdate") >= cut)
        .select(col("o_custkey")).as[Long]
      val agg = new HllSketchAgg[Long](14, identity)
      val ha = aKeys.select(agg.toColumn).head()
      val hb = bKeys.select(agg.toColumn).head()
      val estA = ha.estimate; val estB = hb.estimate
      val estU = ha.merge(hb).estimate
      val estI = graft.sketch.HyperLogLog.intersectionEstimate(ha, hb)
      val exactA = aKeys.distinct().count().toDouble
      val exactB = bKeys.distinct().count().toDouble
      val exactU = aKeys.union(bKeys).distinct().count().toDouble
      val exactI = exactA + exactB - exactU
      val sigma = 3 * 1.04 / math.sqrt((1 << 14).toDouble)
      Seq((
        math.abs(estA - exactA) <= sigma * exactA,
        math.abs(estB - exactB) <= sigma * exactB,
        math.abs(estU - exactU) <= sigma * exactU,
        math.abs(estI - exactI) <= sigma * (exactA + exactB + exactU)))
        .toDF("a_ok", "b_ok", "union_ok", "inter_ok")
    }),

    // -- SLIDING-WINDOW distinct via hourly sketch MERGE, gate-enforced:
    // the hourly HLL table is built once; every 6-hour window estimate is
    // a merge of 6 sketches and must sit within 3σ of the exact sliding
    // distinct count for EVERY window position. The oracle replays the
    // position enumeration, so a dropped or invented window fails too ----
    "sk16_hll_sliding" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val winH = 6; val b = 12
      val est = SketchViews.slidingDistinct(ev, "ts", "user_id", winH, b)
      val hu = ev.select(
          unix_micros(date_trunc("hour", col("ts"))).as("h"), col("user_id"))
        .distinct()
      val exact = hu
        .select(explode(sequence(lit(0), lit(winH - 1))).as("k"),
          col("h"), col("user_id"))
        .select((col("h") + col("k") * lit(3600000000L)).as("window_end_h"),
          col("user_id"))
        .groupBy(col("window_end_h"))
        .agg(countDistinct(col("user_id")).as("exact"))
      // 3σ relative envelope with an absolute floor of 3 counts: tiny
      // partial windows (exact ~ 20) have a relative band narrower than
      // ±1 count, below the estimator's integer granularity
      val sigma3 = 3 * 1.04 / math.sqrt((1 << b).toDouble)
      est.join(exact, "window_end_h")
        .select((abs(col("approx_distinct") - col("exact")) <=
          greatest(lit(sigma3) * col("exact"), lit(3.0))).as("ok"))
        .agg(count(lit(1)).as("n_windows"),
          sum(col("ok").cast("long")).as("n_ok"))
    }),

    // -- THETA/KMV sketch set algebra, HASH-verified (stronger than the
    // sk15 boolean contract): sketch state is the k smallest distinct
    // 48-bit md5 prefixes, so every estimate — union, DIRECT intersection
    // and DIFFERENCE (which HLL inclusion–exclusion cannot resolve for
    // small overlaps) — is a pure integer function of the data. DuckDB
    // replays the whole sketch relationally (ORDER BY v LIMIT k). In
    // production the same aggregator takes codegen'd xxhash64 input;
    // only ≤k longs per sketch ever reach the driver ---------------------
    "sk17_theta_setops" -> ((s, d) => {
      import s.implicits._
      import graft.sketch.Theta
      val o = Tables.orders(s, d)
      val cut = lit("1997-01-01").cast("timestamp")
      val hv = conv(substring(
        md5(concat(col("o_custkey").cast("string"), lit(":th5"))), 1, 12),
        16, 10).cast("long")
      val aH = o.filter(col("o_orderdate") < cut).select(hv.as("v")).as[Long]
      val bH = o.filter(col("o_orderdate") >= cut).select(hv.as("v")).as[Long]
      val k = 256
      val agg = new ThetaAgg[Long](k, 48, identity)
      val ta = aH.select(agg.toColumn).head()
      val tb = bH.select(agg.toColumn).head()
      val tu = ta.merge(tb)
      def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
      Seq((r4(ta.estimate), r4(tb.estimate), r4(tu.estimate),
          r4(Theta.intersectionEstimate(ta, tb)),
          r4(Theta.aNotBEstimate(ta, tb)),
          r4(Theta.aNotBEstimate(tb, ta)),
          r4(Theta.jaccardEstimate(ta, tb))))
        .toDF("est_a", "est_b", "est_union", "est_inter",
          "est_a_not_b", "est_b_not_a", "jaccard")
    }),

    // -- GRID-HISTOGRAM quantiles, HASH-verified: mergeable quantile
    // sketch whose bucket counts are EXACT integers and whose bucket
    // function + interpolation are plain IEEE arithmetic — the whole
    // sketch replays relationally (unlike approx_percentile's
    // engine-internal GK state, sk09/sk13). Deterministic error bound:
    // one bucket width, emitted alongside the estimates ------------------
    "sk19_grid_quantiles" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.lineitem(s, d).select(col("l_extendedprice")).as[Double]
      val agg = new GridHistogramAgg[Double](0.0, 110000.0, 2048, identity)
      val h = ds.select(agg.toColumn).head()
      def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
      Seq((h.inRange, r4(h.quantile(0.5)), r4(h.quantile(0.95)),
          r4(h.quantile(0.99)), r4(h.width)))
        .toDF("n", "p50", "p95", "p99", "err_bound")
    }),

    // -- PER-GROUP theta churn: the sk17 sketch as a DISTRIBUTED
    // aggregation buffer (ObjectHashAggregate partial-merges Kryo Theta
    // state per o_orderpriority), then lost/new/retained customer
    // estimates per group via direct set algebra — the week-over-week
    // churn matrix HLLs cannot produce. Executor-side map computes the
    // estimates; only 5 (group, ≤2·k longs) rows ever exist. Same full
    // relational replay as sk17, per group -------------------------------
    "sk18_theta_churn" -> ((s, d) => {
      import s.implicits._
      import graft.sketch.Theta
      import org.apache.spark.sql.Dataset
      val o = Tables.orders(s, d)
      val cut = lit("1997-01-01").cast("timestamp")
      val hv = conv(substring(
        md5(concat(col("o_custkey").cast("string"), lit(":th5"))), 1, 12),
        16, 10).cast("long")
      val k = 128
      val agg = new ThetaAgg[(String, Long)](k, 48, _._2)
      def grouped(f: org.apache.spark.sql.DataFrame): Dataset[(String, Theta)] =
        f.select(col("o_orderpriority"), hv.as("v")).as[(String, Long)]
          .groupByKey(_._1).agg(agg.toColumn.name("sk"))
      val a = grouped(o.filter(col("o_orderdate") < cut))
      val b = grouped(o.filter(col("o_orderdate") >= cut))
      def r4(x: Double) = math.floor(x * 10000 + 0.5) / 10000
      a.joinWith(b, a("key") === b("key"))
        .map { case ((p, ta), (_, tb)) =>
          (p, r4(ta.estimate), r4(tb.estimate),
            r4(Theta.aNotBEstimate(ta, tb)),
            r4(Theta.aNotBEstimate(tb, ta)),
            r4(Theta.intersectionEstimate(ta, tb)))
        }
        .toDF("o_orderpriority", "est_before", "est_after",
          "est_lost", "est_new", "est_retained")
        .orderBy(col("o_orderpriority"))
    }),

    // -- incrementally-maintained SKETCH materialized view driven by a
    // REAL stream: per-hour HLL store folded micro-batch by micro-batch;
    // register-max merge is associative/commutative/idempotent, so the
    // store must be BIT-identical to the one-shot batch build (enforced
    // per hour) and every hour's estimate within 3σ (+abs floor) of the
    // exact distinct count. The oracle replays the hour enumeration -----
    "st11_stream_sketch_view" -> ((s, d) => {
      import s.implicits._
      val b = 12
      val ev = Tables.events(s, d)
      val store = graft.streaming.EventStreams.hourlySketchViewStreamed(s, ev,
        s"target/qtmp/${d.replaceAll("[^a-zA-Z0-9]", "_")}/st11_stage", b = b)
      val batchSk = ev
        .select(unix_micros(date_trunc("hour", col("ts"))).as("h"),
          col("user_id").as("id"))
        .as[(Long, Long)].groupByKey(_._1)
        .agg(new HllSketchAgg[(Long, Long)](b, _._2).toColumn)
        .map { case (h, sk) => (h, SketchViews.sketchToBytes(sk)) }
        .toDF("h", "sk_batch")
      val est = store.as[(Long, Array[Byte])]
        .map { case (h, bytes) =>
          (h, SketchViews.sketchFromBytes(bytes).cardinality)
        }.toDF("h", "approx")
      val exact = ev
        .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("h"))
        .agg(countDistinct(col("user_id")).as("exact"))
      val sigma3 = 3 * 1.04 / math.sqrt((1 << b).toDouble)
      store.join(batchSk, "h").join(est, "h").join(exact, "h")
        .select(
          (col("sk") === col("sk_batch")).as("bits_eq"),
          (abs(col("approx") - col("exact")) <=
            greatest(lit(sigma3) * col("exact"), lit(3.0))).as("within"))
        .agg(count(lit(1)).as("n_hours"),
          sum(col("bits_eq").cast("long")).as("n_bitmatch"),
          sum(col("within").cast("long")).as("n_within"))
    }),

    // -- sample_total (exact-k without replacement, sample.rs:7-33) ------
    // random-permutation-prefix form -> TakeOrderedAndProject (PlanSpec).
    // The output aggregates the sample's CONTRACT, which IS
    // SQL-expressible and hash-gated: exactly k rows, all distinct, all
    // from the population (semi-join back to documents). The sampled ids
    // themselves are seed-dependent (rows-only would be the only option),
    // but the contract oracle pins exactness through the driver gate.
    "sk11_sample_total" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("doc_id")).as[Long]
      val sample = GraftStream(docs).sampleTotal(100, seed = 7L).ds.toDF("doc_id")
      val valid = sample.join(Tables.documents(s, d).select(col("doc_id")), Seq("doc_id"), "left_semi")
      sample.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_distinct"))
        .crossJoin(valid.agg(count(lit(1)).as("n_valid")))
    }),

    "sk10_reservoir_per_key" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.events(s, d)
        .select(col("event_type"), col("event_id")).as[(String, Long)]
      val agg = contramap((t: (String, Long)) => t._2,
        new SampleUnstable[Long](5, 42L))
      ds.groupByKey(_._1).agg(agg.toColumn.name("sample"))
        .toDF("event_type", "sample")
        .select(col("event_type"), size(col("sample")).cast("long").as("n_sampled"))
        .orderBy(col("event_type"))
    }),

    // -- sk20: BYTE-STABLE HLL EXPORT, the cross-system interop gate.
    // Spark builds the sketch over in-plan 48-bit md5 prefixes (hash in
    // the PLAN, like sk17's theta), exports the documented
    // [version, b, registers] byte string, RE-IMPORTS it, and emits
    //  (1) the md5 fingerprint of the export's hex form and
    //  (2) the estimate recomputed from the re-imported bytes via the
    //      integer-exact rational sum.
    // The oracle rebuilds the same 258 bytes register-by-register in
    // pure SQL (idx = top 8 hash bits, rank = 41 − bitlength(remaining
    // 40 bits), max per register) and the same one-division estimate —
    // a full-precision hash match means another engine can consume our
    // sketch bytes and reproduce our numbers exactly, the property the
    // reference proves against BigQuery
    // (/root/reference/amadeus-streaming/src/distinct.rs:738-756). ------
    "sk20_hll_export" -> ((s, d) => {
      import s.implicits._
      val hv = conv(substring(md5(concat(col("l_partkey").cast("string"),
        lit(":sk20"))), 1, 12), 16, 10).cast("long")
      val ds = Tables.lineitem(s, d).select(hv.as("v")).as[Long]
      val agg = new HllRawAgg[Long](8, _ << 16)
      val sketch = ds.select(agg.toColumn).head()
      val bytes = sketch.toBytes
      val hex = bytes.map(x => f"${x & 0xff}%02x").mkString
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("UTF-8")).map(x => f"${x & 0xff}%02x").mkString
      val reimported = graft.sketch.HyperLogLog.fromBytes(bytes)
      val est = math.floor(reimported.estimateReplayable * 10000 + 0.5) / 10000
      Seq((fp, bytes.length.toLong, est)).toDF("export_md5", "n_bytes", "est")
    }),

    // -- sk21: HLL SKETCH TABLE end-to-end — the production pattern the
    // sk20 byte format exists for: one 258-byte sketch per
    // (event_type, day) shard (HllBytesRawAgg: the persisted parquet
    // form), then a per-type rollup that union-merges SHARD BYTES only
    // (HllMergeEstimateAgg — raw events are never re-read; this is
    // BigQuery's HLL_COUNT.INIT → MERGE). The oracle reconstructs every
    // per-type register relationally from the raw data — equality
    // proves shard→merge→estimate is exactly the one-pass sketch, and
    // the byte format round-trips through a real exchange. ------------
    "sk21_hll_sketch_table" -> ((s, d) => {
      import s.implicits._
      val hv = conv(substring(md5(concat(col("user_id").cast("string"),
        lit(":sk21"))), 1, 12), 16, 10).cast("long")
      val daily = Tables.events(s, d)
        .select(col("event_type"), col("ts").cast("date").cast("string").as("day"),
          hv.as("v"))
        .as[(String, String, Long)]
      val shards = daily.groupByKey(t => (t._1, t._2))
        .agg(new HllBytesRawAgg[(String, String, Long)](8, _._3 << 16)
          .toColumn.name("sk"))
        .map { case ((typ, day), sk) => (typ, day, sk) }
      val rolled = shards.groupByKey(_._1)
        .agg(zip2(
          new CountAll[(String, String, Array[Byte])](),
          contramap((t: (String, String, Array[Byte])) => t._3,
            new HllMergeEstimateAgg(8))).toColumn.name("r"))
      rolled.toDF("event_type", "r")
        .select(col("event_type"), col("r._1").as("n_days"),
          (floor(col("r._2") * 10000 + lit(0.5)) / 10000).as("est_users"))
        .orderBy(col("event_type"))
    }),

    // -- sk22: theta sketch byte export — same interop discipline as
    // sk20 for the SECOND sketch family: canonical ascending-value
    // encoding [1, k, domainBits, n, values…], DuckDB rebuilds the
    // identical bytes from ORDER BY v LIMIT k and matches the md5 AND
    // the re-imported estimate. -----------------------------------------
    "sk22_theta_export" -> ((s, d) => {
      import s.implicits._
      val hv = conv(substring(md5(concat(col("o_custkey").cast("string"),
        lit(":sk22"))), 1, 12), 16, 10).cast("long")
      val ds = Tables.orders(s, d).select(hv.as("v")).as[Long]
      val sketch = ds.select(new ThetaAgg[Long](256, 48, identity).toColumn).head()
      val bytes = sketch.toBytes
      val hex = bytes.map(x => f"${x & 0xff}%02x").mkString
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("UTF-8")).map(x => f"${x & 0xff}%02x").mkString
      val re = graft.sketch.Theta.fromBytes(bytes)
      val est = math.floor(re.estimate * 10000 + 0.5) / 10000
      Seq((fp, bytes.length.toLong, est)).toDF("export_md5", "n_bytes", "est")
    }),

    // -- sk23: grid-histogram byte export — the THIRD family: header
    // [1, lo-bits, hi-bits, buckets, under, over, nan] + exact integer
    // bucket counts, rebuilt relationally from the bucket census and
    // matched byte-for-byte (md5) plus the re-imported p50. -------------
    "sk23_grid_export" -> ((s, d) => {
      import s.implicits._
      val ds = Tables.lineitem(s, d).select(col("l_extendedprice")).as[Double]
      val agg = new GridHistogramAgg[Double](0.0, 110000.0, 2048, identity)
      val sketch = ds.select(agg.toColumn).head()
      val bytes = sketch.toBytes
      val hex = bytes.map(x => f"${x & 0xff}%02x").mkString
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("UTF-8")).map(x => f"${x & 0xff}%02x").mkString
      val re = graft.sketch.GridHistogram.fromBytes(bytes)
      val p50 = math.floor(re.quantile(0.5) * 10000 + 0.5) / 10000
      Seq((fp, bytes.length.toLong, re.inRange, p50))
        .toDF("export_md5", "n_bytes", "n_in_range", "p50")
    }),

    // -- sk24: THETA sketch table — sk21's pattern for the second
    // family: one theta shard per (event_type, day), per-type rollup
    // merging SHARD BYTES only. Union-merge of KMV sketches = k
    // smallest over the union of retained sets, so the oracle replays
    // the rollup directly as ORDER BY v LIMIT k per type over ALL
    // distinct hashes — equality proves shards lost nothing. -----------
    "sk24_theta_sketch_table" -> ((s, d) => {
      import s.implicits._
      val hv = conv(substring(md5(concat(col("user_id").cast("string"),
        lit(":sk24"))), 1, 12), 16, 10).cast("long")
      val daily = Tables.events(s, d)
        .select(col("event_type"), col("ts").cast("date").cast("string").as("day"),
          hv.as("v"))
        .as[(String, String, Long)]
      val shards = daily.groupByKey(t => (t._1, t._2))
        .agg(new ThetaBytesRawAgg[(String, String, Long)](256, 48, _._3)
          .toColumn.name("sk"))
        .map { case ((typ, day), sk) => (typ, day, sk) }
      val rolled = shards.groupByKey(_._1)
        .agg(contramap((t: (String, String, Array[Byte])) => t._3,
          new ThetaMergeEstimateAgg(256, 48)).toColumn.name("est"))
      rolled.toDF("event_type", "est")
        .select(col("event_type"),
          (floor(col("est") * 10000 + lit(0.5)) / 10000).as("est_users"))
        .orderBy(col("event_type"))
    }),

    // -- sk25: heavy-hitter (Top + Count-Min) byte export — the
    // reference's MARQUEE sketch family (top.rs:39-44 + count_min.rs:
    // 42-116) gets the sk20 interop treatment: Spark builds the full
    // mergeable state over in-plan 48-bit md5 key hashes, exports the
    // documented [header | ranked (key,count) entries | CMS cells]
    // byte string, re-imports it, and emits the export's md5 + the
    // re-imported top-1. The oracle rebuilds the IDENTICAL bytes in
    // pure SQL: entries from exact GROUP BY counts, CMS cells by
    // replaying the documented splitmix64 double-hash slot function
    // (h1 + row·h2 mod width) over UHUGEINT arithmetic. Regime: keys
    // pre-aggregated (one push per key with its total) and the salt
    // chosen per-cell collision-free for this key domain, so every
    // cell is a pure per-slot sum — order- and partition-independent.
    "sk25_topk_export" -> ((s, d) => {
      import s.implicits._
      import graft.sketch.TopFreq
      val hv = conv(substring(md5(concat(col("s_nationkey").cast("string"),
        lit(":sk25a"))), 1, 12), 16, 10).cast("long")
      val counts = Tables.supplier(s, d)
        .select(hv.as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("c"))
        .as[(Long, Long)]
      val agg = new TopFreqBytesAgg[(Long, Long), Long](10, 4, 1024, _._1, _._2)
      val bytes = counts.select(agg.toColumn).head()
      val hex = bytes.map(x => f"${x & 0xff}%02x").mkString
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("UTF-8")).map(x => f"${x & 0xff}%02x").mkString
      val re = TopFreq.fromBytes[Long](bytes)
      // numeric tie-break here (the sketch's own topN tie-breaks on the
      // key's STRING form, which no SQL replay should have to imitate)
      val (k1, c1) = re.heavy.toSeq.sortBy { case (k, v) => (-v, k) }.head
      Seq((fp, bytes.length.toLong, k1, c1))
        .toDF("export_md5", "n_bytes", "top1_key", "top1_cnt")
    }),

    // -- sk26: heavy-hitter SKETCH TABLE — sk21/sk24's pattern for the
    // Top+CMS family: one TopFreq state per (event_type, day) shard
    // (binary, parquet-persistable), then a per-type rollup that merges
    // SHARD BYTES only and reports the ranked top-n. Exact regime at
    // gate scale (per-shard and per-type key sets fit the tracked cap;
    // no full-depth CMS collision among the key domain — verified), so
    // the oracle is the exact per-type top-n by count. At bench scale
    // the same query exercises eviction honestly (no oracle there). ---
    "sk26_topk_sketch_table" -> ((s, d) => {
      import s.implicits._
      // shard builder shared with the streamed st16 twin (one definition)
      val shards = graft.streaming.EventStreams
        .topFreqUserShards(Tables.events(s, d))
        .as[(String, String, Array[Byte])]
      val rolled = shards.groupByKey(_._1)
        .agg(contramap((t: (String, String, Array[Byte])) => t._3,
          new TopFreqMergeTopNAgg[Long](50, 4, 2048)).toColumn.name("top"))
      rolled.flatMap { case (typ, top) =>
        top.zipWithIndex.map { case ((u, c), i) => (typ, (i + 1).toLong, u, c) } }
        .toDF("event_type", "rank", "user_id", "cnt")
        .orderBy(col("event_type"), col("rank"))
    }),

    // -- sk27: most_distinct (Top⟨K,HLL⟩) byte export — the last
    // md5-gatable sketch family: DuckDB rebuilds the header + every
    // TRACKED key's HLL registers relationally (sk20's idx/rank
    // derivation, but through the sketch's own splitmix64 value hash,
    // replayed in UHUGEINT SQL — keys/values are raw BIGINTs, no
    // plan-side md5). The gate md5 covers the header+entries PREFIX of
    // the export: the HLL-CMS tail is fed only by each key's FIRST
    // arrival per partial buffer (Space-Saving semantics, same as the
    // reference's Top — the tail exists to rank UNTRACKED keys), so
    // its cells are partition-dependent by design and no relational
    // rebuild is claimed for them — the full-length field and the
    // re-imported top-1 estimate still pin the whole layout and the
    // round-trip. Tracked-entry exactness needs only no full-depth key
    // collision (verified: 0 for this domain at depth 4 × width 512).
    "sk27_topdistinct_export" -> ((s, d) => {
      import s.implicits._
      import graft.sketch.TopDistinct
      val ds = Tables.supplier(s, d)
        .select(col("s_nationkey").cast("long"), col("s_suppkey").cast("long"))
        .as[(Long, Long)]
      val agg = new TopDistinctBytesAgg[(Long, Long), Long](10, 4, 512, 4,
        _._1, _._2)
      val bytes = ds.select(agg.toColumn).head()
      val re = TopDistinct.fromBytes[Long](bytes)
      // header (20B) + m entries of (4B len + 8B key + 18B HLL block)
      val prefix = bytes.take(20 + 30 * re.heavy.size)
      val hex = prefix.map(x => f"${x & 0xff}%02x").mkString
      val fp = java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("UTF-8")).map(x => f"${x & 0xff}%02x").mkString
      // rounded-then-ranked with a numeric key tie-break (the 4-bit HLL
      // ties whole groups of keys; both engines must cut identically)
      val ranked = re.heavy.toSeq
        .map { case (k, h) =>
          (k, math.floor(h.estimateReplayable * 10000 + 0.5) / 10000) }
        .sortBy { case (k, e) => (-e, k) }
      val (k1, e1) = ranked.head
      Seq((fp, bytes.length.toLong, re.heavy.size.toLong, k1, e1))
        .toDF("export_md5", "n_bytes", "n_tracked", "top1_key", "top1_est")
    }),

    // -- approximate quantiles (mergeable quantile sketch) ---------------
    // approx_percentile is Spark's Greenwald-Khanna-family sketch: the
    // scale path for percentiles (q22 is the exact twin). Rows-only:
    // rank-error contracts differ per engine; SketchSpec bounds it
    // against the exact answer instead.
    "sk09_approx_quantiles" -> ((s, d) =>
      Tables.lineitem(s, d)
        .agg(
          round(expr("approx_percentile(l_extendedprice, 0.5, 1000)"), 2).as("p50"),
          round(expr("approx_percentile(l_extendedprice, 0.95, 1000)"), 2).as("p95"),
          round(expr("approx_percentile(l_extendedprice, 0.99, 1000)"), 2).as("p99")))
  )

  val oracles: Map[String, String] = Map(
    "sk02_most_frequent_exact" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |GROUP BY o_orderpriority ORDER BY n DESC, o_orderpriority LIMIT 10""".stripMargin,
    // sk05b: full relational replay of the constrained-regime reservoir —
    // Vitter pass (closed-form splitmix64 draws, max-i write wins each
    // slot) + the final zero-merge deal (50 recursive removal steps with
    // precomputed draw indices; 16294208416658607535 = mix64(0), the
    // deal's seed since zero and partial share seed 42). The UHUGEINT
    // three-stage pipelines are splitmix64's add/mul-xor-shift mod 2^64
    // (the sk25 pattern); floorMod is the signed-reinterpret + double-mod.
    "sk05b_reservoir_replay" ->
      """WITH RECURSIVE ordered AS (
        |  SELECT l_orderkey, l_linenumber,
        |    row_number() OVER (ORDER BY l_orderkey, l_linenumber) AS rn
        |  FROM lineitem),
        |va AS (SELECT rn, (((rn-50)::UBIGINT::UHUGEINT + 11400714819323198485::UHUGEINT)
        |   % 18446744073709551616::UHUGEINT)::UBIGINT AS a FROM ordered WHERE rn > 50),
        |vb AS (SELECT rn, ((xor(a, a>>30)::UHUGEINT * 13787848793156543929::UHUGEINT)
        |   % 18446744073709551616::UHUGEINT)::UBIGINT AS a FROM va),
        |vc AS (SELECT rn, ((xor(a, a>>27)::UHUGEINT * 10723151780598845931::UHUGEINT)
        |   % 18446744073709551616::UHUGEINT)::UBIGINT AS a FROM vb),
        |vd AS (SELECT rn, xor(xor(a, a>>31), 42::UBIGINT) AS a FROM vc),
        |ve AS (SELECT rn, ((a::UHUGEINT + 11400714819323198485::UHUGEINT)
        |   % 18446744073709551616::UHUGEINT)::UBIGINT AS a FROM vd),
        |vf AS (SELECT rn, ((xor(a, a>>30)::UHUGEINT * 13787848793156543929::UHUGEINT)
        |   % 18446744073709551616::UHUGEINT)::UBIGINT AS a FROM ve),
        |vg AS (SELECT rn, ((xor(a, a>>27)::UHUGEINT * 10723151780598845931::UHUGEINT)
        |   % 18446744073709551616::UHUGEINT)::UBIGINT AS a FROM vf),
        |vh AS (SELECT rn, xor(a, a>>31) AS h FROM vg),
        |vj AS (SELECT rn,
        |   ((((CASE WHEN h >= 9223372036854775808::UBIGINT
        |       THEN h::HUGEINT - 18446744073709551616::HUGEINT
        |       ELSE h::HUGEINT END) % rn::HUGEINT) + rn::HUGEINT) % rn::HUGEINT)::BIGINT AS j
        |  FROM vh),
        |writes AS (
        |  SELECT rn, rn - 1 AS slot FROM ordered WHERE rn <= 50
        |  UNION ALL
        |  SELECT rn, j AS slot FROM vj WHERE j < 50),
        |win AS (SELECT slot, max(rn) AS rn FROM writes GROUP BY slot),
        |partial AS (SELECT list(struct_pack(ok := o.l_orderkey, ln := o.l_linenumber)
        |    ORDER BY w.slot) AS l
        |  FROM win w JOIN ordered o USING (rn)),
        |pt AS (SELECT (r.range + 1)::BIGINT AS t FROM range(50) r),
        |pa AS (SELECT t, ((t::UBIGINT::UHUGEINT + 11400714819323198485::UHUGEINT)
        |   % 18446744073709551616::UHUGEINT)::UBIGINT AS a FROM pt),
        |pb AS (SELECT t, ((xor(a, a>>30)::UHUGEINT * 13787848793156543929::UHUGEINT)
        |   % 18446744073709551616::UHUGEINT)::UBIGINT AS a FROM pa),
        |pc AS (SELECT t, ((xor(a, a>>27)::UHUGEINT * 10723151780598845931::UHUGEINT)
        |   % 18446744073709551616::UHUGEINT)::UBIGINT AS a FROM pb),
        |pd AS (SELECT t, xor(xor(a, a>>31), 16294208416658607535::UBIGINT) AS a FROM pc),
        |pe AS (SELECT t, ((a::UHUGEINT + 11400714819323198485::UHUGEINT)
        |   % 18446744073709551616::UHUGEINT)::UBIGINT AS a FROM pd),
        |pf AS (SELECT t, ((xor(a, a>>30)::UHUGEINT * 13787848793156543929::UHUGEINT)
        |   % 18446744073709551616::UHUGEINT)::UBIGINT AS a FROM pe),
        |pg AS (SELECT t, ((xor(a, a>>27)::UHUGEINT * 10723151780598845931::UHUGEINT)
        |   % 18446744073709551616::UHUGEINT)::UBIGINT AS a FROM pf),
        |ph AS (SELECT t, xor(a, a>>31) AS h FROM pg),
        |pj AS (SELECT t,
        |   ((((CASE WHEN h >= 9223372036854775808::UBIGINT
        |       THEN h::HUGEINT - 18446744073709551616::HUGEINT
        |       ELSE h::HUGEINT END) % (51-t)::HUGEINT) + (51-t)::HUGEINT)
        |     % (51-t)::HUGEINT)::BIGINT AS idx
        |  FROM ph),
        |perm AS (
        |  SELECT 0::BIGINT AS t, (SELECT l FROM partial) AS remaining,
        |    []::STRUCT(ok BIGINT, ln INTEGER)[] AS picked
        |  UNION ALL
        |  SELECT s.t + 1, s.remaining[:d.idx] || s.remaining[d.idx+2:],
        |    s.picked || [s.remaining[d.idx+1]]
        |  FROM perm s JOIN pj d ON d.t = s.t + 1
        |  WHERE s.t < 50),
        |fin AS (SELECT picked FROM perm WHERE t = 50),
        |ex AS (SELECT generate_subscripts(picked, 1) - 1 AS slot,
        |  unnest(picked) AS e FROM fin)
        |SELECT slot::BIGINT AS slot, e.ok AS l_orderkey,
        |  e.ln::BIGINT AS l_linenumber
        |FROM ex ORDER BY slot""".stripMargin,
    // sk28: contract booleans (the estimates are arrival-order state,
    // the BOUND is the verifiable claim — asserted in-gate vs exact
    // ranks, here pinned TRUE per quantile)
    "sk28_gk_quantiles_contract" ->
      """SELECT CAST(q AS DOUBLE) AS q, rank_ok FROM (VALUES
        | (0.01, TRUE), (0.1, TRUE), (0.25, TRUE), (0.5, TRUE),
        | (0.75, TRUE), (0.9, TRUE), (0.99, TRUE)) t(q, rank_ok)
        |ORDER BY q""".stripMargin,
    // sk03c: the forced-decision FSS fold replayed with a recursive CTE
    // carrying the tracked set as a struct list — insert below cap,
    // evict-the-unique-minimum above it; counts are exact in this regime
    "sk03c_most_frequent_replay" ->
      """WITH RECURSIVE seq AS (SELECT r, 1000 + r AS k, (r*37) % 97 + 2 AS c
        |  FROM (SELECT unnest(range(1, 61)) AS r)),
        |sim AS (
        |  SELECT 0::BIGINT AS r, []::STRUCT(k BIGINT, c BIGINT)[] AS S
        |  UNION ALL
        |  SELECT cur.r,
        |    CASE
        |      WHEN len(prev.S) < 20
        |        THEN list_append(prev.S, {'k': cur.k, 'c': cur.c})
        |      WHEN cur.c > list_reduce(list_transform(prev.S, x -> x.c),
        |          (a,b) -> least(a,b))
        |        THEN list_append(list_filter(prev.S, x ->
        |          x.c != list_reduce(list_transform(prev.S, y -> y.c),
        |            (a,b) -> least(a,b))),
        |          {'k': cur.k, 'c': cur.c})
        |      ELSE prev.S END
        |  FROM sim prev JOIN seq cur ON cur.r = prev.r + 1
        |),
        |fin AS (SELECT S FROM sim WHERE r = 60),
        |ex AS (SELECT unnest(S) AS e FROM fin)
        |SELECT row_number() OVER (ORDER BY e.c DESC, e.k) AS rank,
        |  e.k, e.c AS n
        |FROM ex ORDER BY e.c DESC, e.k LIMIT 5""".stripMargin,
    // sk01: the plain HLL distinct estimate, hash-verified (was
    // rows-only since round 1): the b=14 register table rebuilt
    // relationally from the distinct keys (splitmix64 value hash,
    // idx = h>>50, rank = 65−bitlen((h·2¹⁴)|2¹³)), then the EXACT
    // estimator — ordered 2⁻ʳ fold over all 16384 registers, left-assoc
    // α·m², the linear-counting branch (which this cardinality regime
    // takes), and Java's floor(est+0.5) rounding
    "sk01_hll_distinct" ->
      """WITH vals AS (SELECT DISTINCT l_partkey::UBIGINT AS v FROM lineitem),
        |va AS (SELECT ((xor(v, 481577407632010445::UBIGINT)::UHUGEINT
        |    + 11400714819323198485::UHUGEINT)
        |    % 18446744073709551616::UHUGEINT)::UBIGINT AS x FROM vals),
        |vb AS (SELECT ((xor(x, x>>30)::UHUGEINT * 13787848793156543929::UHUGEINT)
        |    % 18446744073709551616::UHUGEINT)::UBIGINT AS x FROM va),
        |vc AS (SELECT ((xor(x, x>>27)::UHUGEINT * 10723151780598845931::UHUGEINT)
        |    % 18446744073709551616::UHUGEINT)::UBIGINT AS x FROM vb),
        |vh AS (SELECT xor(x, x>>31) AS h FROM vc),
        |regc AS (SELECT (h >> 50)::BIGINT AS idx,
        |  ((h::UHUGEINT * 16384) % 18446744073709551616::UHUGEINT)::UBIGINT
        |    | 8192::UBIGINT AS y FROM vh),
        |regr AS (SELECT idx, CASE WHEN y >= 9223372036854775808::UBIGINT THEN 1
        |   ELSE 65 - len(format('{:b}', y::BIGINT)) END AS rnk FROM regc),
        |kreg AS (SELECT idx, max(rnk) AS rnk FROM regr GROUP BY 1),
        |grid AS (SELECT g.range AS idx, coalesce(k.rnk, 0) AS rnk
        |  FROM range(16384) g LEFT JOIN kreg k ON k.idx = g.range),
        |hs AS (SELECT list_reduce(list_prepend(0.0::DOUBLE,
        |    list(1.0::DOUBLE / (1::UBIGINT << rnk::INT)::DOUBLE ORDER BY idx)),
        |    (a,b) -> a+b) AS s,
        |  sum(CASE WHEN rnk = 0 THEN 1 ELSE 0 END) AS zeros FROM grid),
        |e AS (SELECT CASE WHEN
        |    (0.7213 / (1.0 + 1.079/16384.0) * 16384.0 * 16384.0 / s)
        |      <= 2.5*16384.0 AND zeros > 0
        |  THEN 16384.0 * ln(16384.0 / zeros)
        |  ELSE 0.7213 / (1.0 + 1.079/16384.0) * 16384.0 * 16384.0 / s
        |  END AS est FROM hs)
        |SELECT floor(est + 0.5)::BIGINT AS approx_parts FROM e""".stripMargin,
    // sk04c: per-key HLL registers rebuilt relationally (sk27's idiom),
    // the EXACT double estimator (ordered 2^-r fold, 0.673·16·16
    // left-assoc, linear-counting branch), then the same forced
    // promotion/eviction fold as sk03c over estimate scores
    "sk04c_most_distinct_replay" ->
      """WITH RECURSIVE seq AS (SELECT r, 1000 + r AS k,
        |    150 + ((r*37) % 97) * 3 AS c
        |  FROM (SELECT unnest(range(1, 61)) AS r)),
        |vals AS (SELECT r, k, (k * 100000 + unnest(range(c)))::UBIGINT AS v
        |  FROM seq),
        |va AS (SELECT r, k, ((xor(v, 481577407632010445::UBIGINT)::UHUGEINT
        |    + 11400714819323198485::UHUGEINT)
        |    % 18446744073709551616::UHUGEINT)::UBIGINT AS x FROM vals),
        |vb AS (SELECT r, k, ((xor(x, x>>30)::UHUGEINT
        |    * 13787848793156543929::UHUGEINT)
        |    % 18446744073709551616::UHUGEINT)::UBIGINT AS x FROM va),
        |vc AS (SELECT r, k, ((xor(x, x>>27)::UHUGEINT
        |    * 10723151780598845931::UHUGEINT)
        |    % 18446744073709551616::UHUGEINT)::UBIGINT AS x FROM vb),
        |vh AS (SELECT r, k, xor(x, x>>31) AS h FROM vc),
        |regc AS (SELECT r, k, (h >> 60)::BIGINT AS idx,
        |   ((h::UHUGEINT * 16) % 18446744073709551616::UHUGEINT)::UBIGINT
        |     | 8::UBIGINT AS y FROM vh),
        |regr AS (SELECT r, k, idx,
        |   CASE WHEN y >= 9223372036854775808::UBIGINT THEN 1
        |        ELSE 65 - len(format('{:b}', y::BIGINT)) END AS rnk
        | FROM regc),
        |kreg AS (SELECT r, k, idx, max(rnk) AS rnk FROM regr GROUP BY 1,2,3),
        |kgrid AS (SELECT seq.r, seq.k, g.range AS idx FROM seq, range(16) g),
        |kfull AS (SELECT kg.r, kg.k, kg.idx, coalesce(kr.rnk, 0) AS rnk
        |  FROM kgrid kg LEFT JOIN kreg kr ON kr.k = kg.k AND kr.idx = kg.idx),
        |hsum AS (SELECT r, k,
        |   list_reduce(list_prepend(0.0::DOUBLE,
        |     list(1.0::DOUBLE / (1::UBIGINT << rnk::INT)::DOUBLE ORDER BY idx)),
        |     (a,b) -> a+b) AS s,
        |   sum(CASE WHEN rnk = 0 THEN 1 ELSE 0 END) AS zeros
        |  FROM kfull GROUP BY 1, 2),
        |est AS (SELECT r, k,
        |   CASE WHEN (0.673 * 16 * 16 / s) <= 2.5 * 16 AND zeros > 0
        |     THEN 16.0 * ln(16.0 / zeros) ELSE 0.673 * 16 * 16 / s END AS e
        |  FROM hsum),
        |sim AS (
        |  SELECT 0::BIGINT AS r, []::STRUCT(k BIGINT, e DOUBLE)[] AS S
        |  UNION ALL
        |  SELECT cur.r,
        |    CASE
        |      WHEN len(prev.S) < 20
        |        THEN list_append(prev.S, {'k': cur.k, 'e': cur.e})
        |      WHEN cur.e > list_reduce(list_transform(prev.S, x -> x.e),
        |          (a,b) -> least(a,b))
        |        THEN list_append(list_filter(prev.S, x ->
        |          x.e != list_reduce(list_transform(prev.S, y -> y.e),
        |            (a,b) -> least(a,b))),
        |          {'k': cur.k, 'e': cur.e})
        |      ELSE prev.S END
        |  FROM sim prev JOIN est cur ON cur.r = prev.r + 1
        |),
        |fin AS (SELECT S FROM sim WHERE r = 60),
        |ex AS (SELECT unnest(S) AS t FROM fin)
        |SELECT row_number() OVER (ORDER BY floor(t.e + 0.5)::BIGINT DESC,
        |    t.k::VARCHAR) AS rank,
        |  t.k, floor(t.e + 0.5)::BIGINT AS n_distinct
        |FROM ex ORDER BY floor(t.e + 0.5)::BIGINT DESC, t.k::VARCHAR
        |LIMIT 5""".stripMargin,
    // sk30: the exact regime's interpolating percentiles (Spark
    // `percentile` == DuckDB quantile_cont, the t09-proven identity)
    "sk30_group_quantiles_auto" ->
      """SELECT k, qi, qv FROM (
        |  SELECT l_returnflag AS k, 0::BIGINT AS qi,
        |    round(quantile_cont(l_extendedprice, 0.25), 4) AS qv
        |  FROM lineitem GROUP BY 1
        |  UNION ALL
        |  SELECT l_returnflag, 1, round(quantile_cont(l_extendedprice, 0.5), 4)
        |  FROM lineitem GROUP BY 1
        |  UNION ALL
        |  SELECT l_returnflag, 2, round(quantile_cont(l_extendedprice, 0.9), 4)
        |  FROM lineitem GROUP BY 1
        |) ORDER BY k, qi""".stripMargin,
    // sk29: the keyed bound, pinned TRUE per (group, quantile) — the
    // group enumeration is relational, the booleans are the contract
    "sk29_gk_quantiles_by_key" ->
      """SELECT k, CAST(q AS DOUBLE) AS q, TRUE AS rank_ok
        |FROM (SELECT DISTINCT l_returnflag AS k FROM lineitem) g,
        |     (VALUES (0.1), (0.5), (0.9), (0.99)) t(q)
        |ORDER BY k, q""".stripMargin,
    "sk06_sort_n_by_group" ->
      """SELECT o_orderstatus, o_orderkey, round(o_totalprice,2) AS price FROM (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |   row_number() OVER (PARTITION BY o_orderstatus
        |     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_orderstatus, o_orderkey""".stripMargin,
    "sk07_kahan_welford" ->
      """SELECT round(avg(l_quantity),4) AS mean_qty,
        | round(stddev_pop(l_quantity),4) AS sd_qty FROM lineitem""".stripMargin,
    "sk08_group_sub_sink" ->
      """SELECT o_custkey, count(*) AS n_orders,
        | round(sum(o_totalprice),2) AS total_spent
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "sk11_sample_total" ->
      "SELECT CAST(100 AS BIGINT) AS n_rows, CAST(100 AS BIGINT) AS n_distinct, CAST(100 AS BIGINT) AS n_valid",
    "sk12_sketch_contracts" ->
      "SELECT TRUE AS hll_ok, TRUE AS res_size_ok, TRUE AS res_member_ok",
    "sk13_quantile_contract" ->
      "SELECT TRUE AS p50_rank_ok, TRUE AS p95_rank_ok",
    "sk14_distinct_contract" ->
      "SELECT DISTINCT o_orderpriority, TRUE AS est_ok FROM orders ORDER BY o_orderpriority",
    // sk03b/sk04b: the skewed stream's top-10 ranking is deterministic
    // (gaps ≫ sketch noise by construction) — replay it exactly; the
    // accuracy bools are contract columns like sk12-sk16
    "sk03b_most_frequent_skewed" ->
      """WITH s AS (SELECT CASE WHEN (l_orderkey & 1023) <> 0
        |    THEN (l_orderkey & -l_orderkey) ELSE l_partkey + 1000000 END AS k
        |  FROM lineitem),
        |g AS (SELECT k, count(*) AS n FROM s GROUP BY k),
        |r AS (SELECT k, row_number() OVER (ORDER BY n DESC, k) AS rank FROM g)
        |SELECT CAST(rank AS BIGINT) AS rank, CAST(k AS BIGINT) AS k,
        | TRUE AS count_ok FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "sk04b_most_distinct_skewed" ->
      """WITH s AS (SELECT CASE WHEN (l_orderkey & 1023) <> 0
        |    THEN (l_orderkey & -l_orderkey) ELSE l_partkey + 1000000 END AS k,
        |    l_orderkey * 10 + l_linenumber AS v
        |  FROM lineitem),
        |g AS (SELECT k, count(DISTINCT v) AS n FROM s GROUP BY k),
        |r AS (SELECT k, row_number() OVER (ORDER BY n DESC, k) AS rank FROM g)
        |SELECT CAST(rank AS BIGINT) AS rank, CAST(k AS BIGINT) AS k,
        | TRUE AS est_ok FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "sk15_hll_setops" ->
      "SELECT TRUE AS a_ok, TRUE AS b_ok, TRUE AS union_ok, TRUE AS inter_ok",
    // sk17: full relational replay of the KMV sketch — retained set =
    // k smallest distinct 48-bit md5 prefixes; theta = max retained when
    // full else 2^48; estimate = (k-1)·2^48/theta when full else n; set
    // ops count exact memberships below min(thetaA, thetaB). All integer
    // ops + ONE double division, so the doubles match Spark bit-for-bit
    "sk17_theta_setops" ->
      """WITH a AS (SELECT DISTINCT
        |    ('0x'||substr(md5(o_custkey::VARCHAR || ':th5'),1,12))::BIGINT AS v
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
        |b AS (SELECT DISTINCT
        |    ('0x'||substr(md5(o_custkey::VARCHAR || ':th5'),1,12))::BIGINT AS v
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
        |u AS (SELECT v FROM a UNION SELECT v FROM b),
        |ta AS (SELECT CASE WHEN count(*) < 256 THEN 281474976710656
        |         ELSE max(v) END AS t, count(*) AS n
        |       FROM (SELECT v FROM a ORDER BY v LIMIT 256)),
        |tb AS (SELECT CASE WHEN count(*) < 256 THEN 281474976710656
        |         ELSE max(v) END AS t, count(*) AS n
        |       FROM (SELECT v FROM b ORDER BY v LIMIT 256)),
        |tu AS (SELECT CASE WHEN count(*) < 256 THEN 281474976710656
        |         ELSE max(v) END AS t, count(*) AS n
        |       FROM (SELECT v FROM u ORDER BY v LIMIT 256)),
        |ti AS (SELECT least(ta.t, tb.t) AS t FROM ta, tb),
        |ni AS (SELECT count(*) AS n FROM a JOIN b USING (v), ti
        |       WHERE v < ti.t),
        |nab AS (SELECT count(*) AS n FROM a, ti WHERE v < ti.t
        |        AND v NOT IN (SELECT v FROM b)),
        |nba AS (SELECT count(*) AS n FROM b, ti WHERE v < ti.t
        |        AND v NOT IN (SELECT v FROM a)),
        |nu AS (SELECT count(*) AS n FROM u, ti WHERE v < ti.t)
        |SELECT
        | floor((CASE WHEN ta.n < 256 THEN ta.n::DOUBLE
        |   ELSE 255.0::DOUBLE * 281474976710656.0::DOUBLE / ta.t END)*10000+0.5)/10000 AS est_a,
        | floor((CASE WHEN tb.n < 256 THEN tb.n::DOUBLE
        |   ELSE 255.0::DOUBLE * 281474976710656.0::DOUBLE / tb.t END)*10000+0.5)/10000 AS est_b,
        | floor((CASE WHEN tu.n < 256 THEN tu.n::DOUBLE
        |   ELSE 255.0::DOUBLE * 281474976710656.0::DOUBLE / tu.t END)*10000+0.5)/10000 AS est_union,
        | floor((ni.n::DOUBLE * 281474976710656.0::DOUBLE / ti.t)*10000+0.5)/10000 AS est_inter,
        | floor((nab.n::DOUBLE * 281474976710656.0::DOUBLE / ti.t)*10000+0.5)/10000 AS est_a_not_b,
        | floor((nba.n::DOUBLE * 281474976710656.0::DOUBLE / ti.t)*10000+0.5)/10000 AS est_b_not_a,
        | floor((CASE WHEN nu.n = 0 THEN 0.0
        |   ELSE ni.n::DOUBLE / nu.n END)*10000+0.5)/10000 AS jaccard
        |FROM ta, tb, tu, ti, ni, nab, nba, nu""".stripMargin,
    // sk20: rebuild the exported [01, 08, registers] byte string
    // relationally — per distinct 48-bit hash: idx = v >> 40,
    // rank = 41 − bitlen(v & (2^40−1)) (57 when the low bits are all
    // zero: the guard bit), register = max rank; absent registers are
    // 0. Estimate via the exact integer sum Σ2^(57−r) (BIGINT terms,
    // HUGEINT sum) → one cast + one division, bit-identical to Spark's
    // estimateReplayable on the re-imported bytes
    "sk20_hll_export" ->
      """WITH vals AS (SELECT DISTINCT
        |    ('0x'||substr(md5(l_partkey::VARCHAR || ':sk20'),1,12))::BIGINT AS v
        |  FROM lineitem),
        |per AS (SELECT v >> 40 AS idx, v & ((1::BIGINT << 40) - 1) AS rem
        |  FROM vals),
        |rk AS (SELECT idx, CASE WHEN rem = 0 THEN 57
        |    ELSE 41 - length(format('{:b}', rem)) END AS r FROM per),
        |regs AS (SELECT idx, max(r) AS r FROM rk GROUP BY idx),
        |fullr AS (SELECT t.i AS idx, coalesce(regs.r, 0) AS r
        |  FROM range(0,256) t(i) LEFT JOIN regs ON regs.idx = t.i),
        |hx AS (SELECT '0108' || string_agg(printf('%02x', r), '' ORDER BY idx)
        |    AS hex FROM fullr),
        |s AS (SELECT CAST(sum((1::BIGINT << (57 - r))) AS DOUBLE) AS sd,
        |    sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS zeros FROM fullr)
        |SELECT md5(hex) AS export_md5, CAST(258 AS BIGINT) AS n_bytes,
        | floor((CASE WHEN 0.7213/(1.0+1.079/256.0) * 256 * 256 * pow(2.0, 57)
        |     / sd <= 2.5*256 AND zeros > 0
        |   THEN 256 * ln(256.0 / zeros)
        |   ELSE 0.7213/(1.0+1.079/256.0) * 256 * 256 * pow(2.0, 57) / sd
        |   END) * 10000 + 0.5)/10000 AS est
        |FROM hx, s""".stripMargin,
    // sk21: the sk20 register reconstruction PER GROUP + a distinct-day
    // census; equality proves the sharded bytes merged to exactly the
    // one-pass sketch
    "sk21_hll_sketch_table" ->
      """WITH vals AS (SELECT DISTINCT event_type,
        |    ('0x'||substr(md5(user_id::VARCHAR || ':sk21'),1,12))::BIGINT AS v
        |  FROM events),
        |per AS (SELECT event_type, v >> 40 AS idx,
        |    v & ((1::BIGINT << 40) - 1) AS rem FROM vals),
        |rk AS (SELECT event_type, idx, CASE WHEN rem = 0 THEN 57
        |    ELSE 41 - length(format('{:b}', rem)) END AS r FROM per),
        |regs AS (SELECT event_type, idx, max(r) AS r FROM rk GROUP BY 1, 2),
        |types AS (SELECT DISTINCT event_type FROM events),
        |fullr AS (SELECT t.event_type, g.i AS idx, coalesce(regs.r, 0) AS r
        |  FROM types t CROSS JOIN range(0,256) g(i)
        |  LEFT JOIN regs ON regs.event_type = t.event_type AND regs.idx = g.i),
        |sums AS (SELECT event_type,
        |    CAST(sum((1::BIGINT << (57 - r))) AS DOUBLE) AS sd,
        |    sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS zeros
        |  FROM fullr GROUP BY 1),
        |days AS (SELECT event_type, count(DISTINCT CAST(ts AS DATE)) AS n_days
        |  FROM events GROUP BY 1)
        |SELECT sums.event_type, days.n_days,
        | floor((CASE WHEN 0.7213/(1.0+1.079/256.0) * 256 * 256 * pow(2.0, 57)
        |     / sd <= 2.5*256 AND zeros > 0
        |   THEN 256 * ln(256.0 / zeros)
        |   ELSE 0.7213/(1.0+1.079/256.0) * 256 * 256 * pow(2.0, 57) / sd
        |   END) * 10000 + 0.5)/10000 AS est_users
        |FROM sums JOIN days USING (event_type)
        |ORDER BY event_type""".stripMargin,
    // sk22: canonical theta encoding rebuilt from ORDER BY v LIMIT k —
    // header literals are the gate's own fixed params (k=256→00000100,
    // domainBits=48→30); body is the data-dependent part
    "sk22_theta_export" ->
      """WITH vals AS (SELECT DISTINCT
        |    ('0x'||substr(md5(o_custkey::VARCHAR || ':sk22'),1,12))::BIGINT AS v
        |  FROM orders),
        |kn AS (SELECT v FROM vals ORDER BY v LIMIT 256),
        |agg AS (SELECT count(*) AS n, max(v) AS mx,
        |    string_agg(printf('%016x', v), '' ORDER BY v) AS body FROM kn)
        |SELECT md5('01' || '00000100' || '30' || printf('%08x', agg.n)
        |    || agg.body) AS export_md5,
        | CAST(10 + 8*agg.n AS BIGINT) AS n_bytes,
        | floor((CASE WHEN agg.n < 256 THEN agg.n::DOUBLE
        |   ELSE 255.0::DOUBLE * 281474976710656.0::DOUBLE / agg.mx
        |   END)*10000+0.5)/10000 AS est
        |FROM agg""".stripMargin,
    // sk23: header literals are the gate's fixed grid params (lo/hi IEEE
    // bits, buckets=2048); under/over/nan and the 2048 counts are the
    // data-dependent region, rebuilt from the exact bucket census (same
    // clamp-at-hi-ulp as GridHistogram.add)
    "sk23_grid_export" ->
      """WITH v AS (SELECT l_extendedprice AS x FROM lineitem),
        |b AS (SELECT least(CAST(floor((x - 0.0) / (110000.0 - 0.0) * 2048)
        |    AS BIGINT), 2047) AS i
        |  FROM v WHERE x >= 0.0 AND x < 110000.0 AND NOT isnan(x)),
        |g AS (SELECT i, count(*) AS c FROM b GROUP BY 1),
        |fullc AS (SELECT t.i, coalesce(g.c, 0) AS c
        |  FROM range(0,2048) t(i) LEFT JOIN g ON g.i = t.i),
        |body AS (SELECT string_agg(printf('%016x', c), '' ORDER BY i) AS hexc
        |  FROM fullc),
        |edges AS (SELECT
        |    count(*) FILTER (WHERE x < 0.0 AND NOT isnan(x)) AS und,
        |    count(*) FILTER (WHERE x >= 110000.0 AND NOT isnan(x)) AS ovr,
        |    count(*) FILTER (WHERE isnan(x)) AS nn FROM v),
        |n AS (SELECT count(*) AS n_in FROM b),
        |cm AS (SELECT i, c, sum(c) OVER (ORDER BY i) - c AS cumb,
        |    sum(c) OVER (ORDER BY i) AS cum FROM g),
        |cand AS (SELECT cm.i, cm.c, cm.cumb,
        |    row_number() OVER (ORDER BY cm.i) AS rn
        |  FROM cm, n WHERE cm.cum >= ceil(0.5 * n.n_in) AND cm.c > 0),
        |est AS (SELECT 0.0 + (110000.0 - 0.0) / 2048 * i
        |    + (110000.0 - 0.0) / 2048
        |      * ((SELECT ceil(0.5 * n_in) FROM n) - cumb) / c AS e
        |  FROM cand WHERE rn = 1)
        |SELECT md5('01' || '0000000000000000' || '40fadb0000000000'
        |    || '00000800' || printf('%016x', edges.und)
        |    || printf('%016x', edges.ovr) || printf('%016x', edges.nn)
        |    || body.hexc) AS export_md5,
        | CAST(45 + 8*2048 AS BIGINT) AS n_bytes,
        | n.n_in AS n_in_range,
        | floor((SELECT e FROM est)*10000+0.5)/10000 AS p50
        |FROM edges, body, n""".stripMargin,
    // sk24: per-type k-smallest replay over all distinct hashes — the
    // shard rollup must equal the one-pass sketch (sk17/sk18 estimate
    // arithmetic)
    "sk24_theta_sketch_table" ->
      """WITH vals AS (SELECT DISTINCT event_type,
        |    ('0x'||substr(md5(user_id::VARCHAR || ':sk24'),1,12))::BIGINT AS v
        |  FROM events),
        |rk AS (SELECT event_type, v,
        |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn
        |  FROM vals),
        |agg AS (SELECT event_type, count(*) AS n, max(v) AS mx
        |  FROM rk WHERE rn <= 256 GROUP BY 1)
        |SELECT event_type,
        | floor((CASE WHEN n < 256 THEN n::DOUBLE
        |   ELSE 255.0::DOUBLE * 281474976710656.0::DOUBLE / mx
        |   END)*10000+0.5)/10000 AS est_users
        |FROM agg ORDER BY event_type""".stripMargin,
    // sk19: exact bucket census + identical IEEE interpolation — rank
    // r = ceil(q·n), first bucket with cum ≥ r, linear within it
    "sk19_grid_quantiles" ->
      """WITH v AS (SELECT l_extendedprice AS x FROM lineitem),
        |t AS (SELECT count(*) AS n FROM v),
        |b AS (SELECT CAST(floor((x - 0.0) / (110000.0 - 0.0) * 2048)
        |    AS BIGINT) AS i FROM v),
        |g AS (SELECT i, count(*) AS c FROM b GROUP BY 1),
        |cm AS (SELECT i, c, sum(c) OVER (ORDER BY i) - c AS cumb,
        |    sum(c) OVER (ORDER BY i) AS cum FROM g),
        |pick(q) AS (VALUES (0.5), (0.95), (0.99)),
        |cand AS (SELECT p.q, cm.i, cm.c, cm.cumb,
        |    row_number() OVER (PARTITION BY p.q ORDER BY cm.i) AS rn
        |  FROM pick p, t, cm WHERE cm.cum >= ceil(p.q * t.n)),
        |est AS (SELECT q, 0.0 + (110000.0 - 0.0) / 2048 * i
        |    + (110000.0 - 0.0) / 2048 * ((SELECT ceil(q * n) FROM t) - cumb) / c
        |    AS e
        |  FROM cand WHERE rn = 1)
        |SELECT (SELECT CAST(n AS BIGINT) FROM t) AS n,
        | floor((SELECT e FROM est WHERE q = 0.5)*10000+0.5)/10000 AS p50,
        | floor((SELECT e FROM est WHERE q = 0.95)*10000+0.5)/10000 AS p95,
        | floor((SELECT e FROM est WHERE q = 0.99)*10000+0.5)/10000 AS p99,
        | floor((110000.0 - 0.0) / 2048 * 10000 + 0.5)/10000 AS err_bound""".stripMargin,
    // sk18: the sk17 replay per group — k smallest per priority via a
    // partitioned row_number, membership census below the per-group
    // min-theta, same integer-exact estimate arithmetic
    "sk18_theta_churn" ->
      """WITH a AS (SELECT DISTINCT o_orderpriority AS p,
        |    ('0x'||substr(md5(o_custkey::VARCHAR || ':th5'),1,12))::BIGINT AS v
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'),
        |b AS (SELECT DISTINCT o_orderpriority AS p,
        |    ('0x'||substr(md5(o_custkey::VARCHAR || ':th5'),1,12))::BIGINT AS v
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
        |ra AS (SELECT p, v FROM (SELECT p, v,
        |    row_number() OVER (PARTITION BY p ORDER BY v) AS rn FROM a)
        |  WHERE rn <= 128),
        |rb AS (SELECT p, v FROM (SELECT p, v,
        |    row_number() OVER (PARTITION BY p ORDER BY v) AS rn FROM b)
        |  WHERE rn <= 128),
        |ta AS (SELECT p, CASE WHEN count(*) < 128 THEN 281474976710656
        |    ELSE max(v) END AS t, count(*) AS n FROM ra GROUP BY p),
        |tb AS (SELECT p, CASE WHEN count(*) < 128 THEN 281474976710656
        |    ELSE max(v) END AS t, count(*) AS n FROM rb GROUP BY p),
        |ti AS (SELECT ta.p, least(ta.t, tb.t) AS t, ta.t AS tpa, ta.n AS na,
        |    tb.t AS tpb, tb.n AS nb FROM ta JOIN tb USING (p)),
        |m AS (SELECT coalesce(a.p, b.p) AS p, coalesce(a.v, b.v) AS v,
        |    a.v IS NOT NULL AS ina, b.v IS NOT NULL AS inb
        |  FROM a FULL JOIN b ON a.p = b.p AND a.v = b.v),
        |x AS (SELECT m.p, m.ina, m.inb FROM m JOIN ti ON m.p = ti.p
        |  WHERE m.v < ti.t),
        |counts AS (SELECT p,
        |    sum(CASE WHEN ina AND NOT inb THEN 1 ELSE 0 END) AS nlost,
        |    sum(CASE WHEN inb AND NOT ina THEN 1 ELSE 0 END) AS nnew,
        |    sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS nret
        |  FROM x GROUP BY p)
        |SELECT ti.p AS o_orderpriority,
        | floor((CASE WHEN ti.na < 128 THEN ti.na::DOUBLE
        |   ELSE 127.0::DOUBLE * 281474976710656.0::DOUBLE / ti.tpa END)
        |   *10000+0.5)/10000 AS est_before,
        | floor((CASE WHEN ti.nb < 128 THEN ti.nb::DOUBLE
        |   ELSE 127.0::DOUBLE * 281474976710656.0::DOUBLE / ti.tpb END)
        |   *10000+0.5)/10000 AS est_after,
        | floor((coalesce(counts.nlost,0)::DOUBLE
        |   * 281474976710656.0::DOUBLE / ti.t)*10000+0.5)/10000 AS est_lost,
        | floor((coalesce(counts.nnew,0)::DOUBLE
        |   * 281474976710656.0::DOUBLE / ti.t)*10000+0.5)/10000 AS est_new,
        | floor((coalesce(counts.nret,0)::DOUBLE
        |   * 281474976710656.0::DOUBLE / ti.t)*10000+0.5)/10000 AS est_retained
        |FROM ti LEFT JOIN counts ON ti.p = counts.p
        |ORDER BY o_orderpriority""".stripMargin,
    "st11_stream_sketch_view" ->
      """WITH n AS (SELECT CAST(count(DISTINCT date_trunc('hour', ts))
        |    AS BIGINT) AS n FROM events)
        |SELECT n AS n_hours, n AS n_bitmatch, n AS n_within FROM n""".stripMargin,
    // window-position enumeration replayed exactly; every window must
    // pass the 3σ contract (n_ok == n_windows)
    "sk16_hll_sliding" ->
      """WITH hu AS (SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
        |  FROM events),
        |pos AS (SELECT DISTINCT h + k * INTERVAL 1 HOUR AS w
        |  FROM hu CROSS JOIN generate_series(0, 5) AS g(k))
        |SELECT CAST(count(*) AS BIGINT) AS n_windows,
        |  CAST(count(*) AS BIGINT) AS n_ok
        |FROM pos""".stripMargin,
    "sk10_reservoir_per_key" ->
      """SELECT event_type, least(5, count(*)) AS n_sampled
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // sk25: rebuild the exported heavy-hitter bytes in pure SQL —
    // header + exact (key,count) entries ranked (cnt DESC, key), then
    // the 4×1024 CMS cells by replaying the sketch's documented
    // splitmix64 double hash (h1 + row·h2, floorMod width; width is a
    // power of two so the floorMod is a mask). Constants
    // 8061940054357698418 / 10479983315199559128 are the pre-mixed row
    // seeds mix64(0x5bd1e995) / mix64(0x27d4eb2f); the three UHUGEINT
    // stages are splitmix64's add/mul-xor-shift pipeline mod 2^64.
    "sk25_topk_export" ->
      """WITH counts AS (
        |  SELECT ('0x'||substr(md5(s_nationkey::VARCHAR || ':sk25a'),1,12))::BIGINT::UBIGINT AS k,
        |         count(*)::BIGINT AS c
        |  FROM supplier GROUP BY 1),
        |m1 AS (SELECT k, c,
        |   ((xor(k, 8061940054357698418::UBIGINT)::UHUGEINT + 11400714819323198485::UHUGEINT)
        |     % 18446744073709551616::UHUGEINT)::UBIGINT AS x1,
        |   ((xor(k, 10479983315199559128::UBIGINT)::UHUGEINT + 11400714819323198485::UHUGEINT)
        |     % 18446744073709551616::UHUGEINT)::UBIGINT AS y1
        | FROM counts),
        |m2 AS (SELECT k, c,
        |   ((xor(x1, x1>>30)::UHUGEINT * 13787848793156543929::UHUGEINT)
        |     % 18446744073709551616::UHUGEINT)::UBIGINT AS x2,
        |   ((xor(y1, y1>>30)::UHUGEINT * 13787848793156543929::UHUGEINT)
        |     % 18446744073709551616::UHUGEINT)::UBIGINT AS y2 FROM m1),
        |m3 AS (SELECT k, c,
        |   ((xor(x2, x2>>27)::UHUGEINT * 10723151780598845931::UHUGEINT)
        |     % 18446744073709551616::UHUGEINT)::UBIGINT AS x3,
        |   ((xor(y2, y2>>27)::UHUGEINT * 10723151780598845931::UHUGEINT)
        |     % 18446744073709551616::UHUGEINT)::UBIGINT AS y3 FROM m2),
        |h AS (SELECT k, c, xor(x3, x3>>31) AS h1,
        |   xor(y3, y3>>31) | 1::UBIGINT AS h2 FROM m3),
        |slots AS (SELECT r.r, h.k, h.c,
        |    (r.r*1024 + (((h.h1::UHUGEINT + r.r::UHUGEINT*h.h2::UHUGEINT)
        |      % 18446744073709551616::UHUGEINT)::UBIGINT & 1023::UBIGINT)::BIGINT)::BIGINT AS slot
        |  FROM h, range(4) r(r)),
        |cells AS (SELECT g.range AS slot, coalesce(sum(s.c), 0)::BIGINT AS v
        |  FROM range(4096) g LEFT JOIN slots s ON s.slot = g.range GROUP BY 1),
        |hdr AS (SELECT '010004' || printf('%08x', 1024) || printf('%08x', 10)
        |  || printf('%08x', 40)
        |  || printf('%08x', (SELECT count(*) FROM counts)::BIGINT) AS hx),
        |entries AS (SELECT string_agg(printf('%08x', 8) || printf('%016x', k::BIGINT)
        |  || printf('%016x', c), '' ORDER BY c DESC, k) AS hx FROM counts),
        |cellhex AS (SELECT string_agg(printf('%016x', v), '' ORDER BY slot) AS hx
        |  FROM cells),
        |fullhex AS (SELECT hdr.hx || entries.hx || cellhex.hx AS hx
        |  FROM hdr, entries, cellhex),
        |top1 AS (SELECT k, c FROM counts ORDER BY c DESC, k LIMIT 1)
        |SELECT md5(fullhex.hx) AS export_md5,
        | (19 + 20*(SELECT count(*) FROM counts) + 8*4096)::BIGINT AS n_bytes,
        | top1.k::BIGINT AS top1_key, top1.c AS top1_cnt
        |FROM fullhex, top1""".stripMargin,
    // sk26: the shard→merge-bytes rollup must equal the exact per-type
    // top-n (rank ties broken on the key's string form, the sketch's
    // own deterministic tie-break)
    "sk26_topk_sketch_table" ->
      """WITH c AS (SELECT event_type, user_id, count(*)::BIGINT AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, user_id, cnt,
        |   row_number() OVER (PARTITION BY event_type
        |     ORDER BY cnt DESC, user_id::VARCHAR) AS rank
        | FROM c)
        |SELECT event_type, rank::BIGINT AS rank, user_id, cnt
        |FROM r WHERE rank <= 50 ORDER BY 1, 2""".stripMargin,
    // sk27: relational rebuild of the Top⟨K,HLL⟩ TRACKED state —
    // per-key HLL registers (idx = top 4 bits of the splitmix64 value
    // hash, rank = 65 − bitlength((h·16 mod 2⁶⁴)|8)), the documented
    // header/entry layout, md5 of the header+entries hex, the full
    // export length, and the integer-exact rational estimate of the
    // top key. The HLL-CMS tail is first-arrival-fed (partition-
    // dependent by design) and excluded from the md5 — see the query
    // comment. Constant 481577407632010445 is the pre-mixed HLL value
    // seed mix64(0x9c3779b9).
    "sk27_topdistinct_export" ->
      """WITH pairs AS (SELECT DISTINCT s_nationkey::UBIGINT AS k,
        |    s_suppkey::UBIGINT AS v FROM supplier),
        |keys AS (SELECT DISTINCT k FROM pairs),
        |va AS (SELECT k, v,
        |   ((xor(v, 481577407632010445::UBIGINT)::UHUGEINT + 11400714819323198485::UHUGEINT)
        |     % 18446744073709551616::UHUGEINT)::UBIGINT AS x FROM pairs),
        |vb AS (SELECT k, ((xor(x, x>>30)::UHUGEINT * 13787848793156543929::UHUGEINT)
        |     % 18446744073709551616::UHUGEINT)::UBIGINT AS x FROM va),
        |vc AS (SELECT k, ((xor(x, x>>27)::UHUGEINT * 10723151780598845931::UHUGEINT)
        |     % 18446744073709551616::UHUGEINT)::UBIGINT AS x FROM vb),
        |vh AS (SELECT k, xor(x, x>>31) AS h FROM vc),
        |regc AS (SELECT k, (h >> 60)::BIGINT AS idx,
        |   ((h::UHUGEINT * 16) % 18446744073709551616::UHUGEINT)::UBIGINT
        |     | 8::UBIGINT AS y
        | FROM vh),
        |regr AS (SELECT k, idx,
        |   CASE WHEN y >= 9223372036854775808::UBIGINT THEN 1
        |        ELSE 65 - len(format('{:b}', y::BIGINT)) END AS rank
        | FROM regc),
        |kreg AS (SELECT k, idx, max(rank) AS r FROM regr GROUP BY 1, 2),
        |kgrid AS (SELECT keys.k, g.range AS idx FROM keys, range(16) g),
        |kfull AS (SELECT kg.k, kg.idx, coalesce(kr.r, 0) AS r
        |  FROM kgrid kg LEFT JOIN kreg kr ON kr.k = kg.k AND kr.idx = kg.idx),
        |kblock AS (SELECT k, string_agg(printf('%02x', r), '' ORDER BY idx) AS regs
        |  FROM kfull GROUP BY k),
        |entries AS (SELECT string_agg(
        |    '00000008' || printf('%016x', k::BIGINT) || '0104' || regs, '' ORDER BY k) AS hx
        |  FROM kblock),
        |hdr AS (SELECT '010004' || printf('%08x', 512) || printf('%08x', 10)
        |  || printf('%08x', 40) || '04'
        |  || printf('%08x', (SELECT count(*) FROM keys)::BIGINT) AS hx),
        |fullhex AS (SELECT hdr.hx || entries.hx AS hx FROM hdr, entries),
        |kstat AS (SELECT k,
        |    sum(CASE WHEN r = 0 THEN 1 ELSE 0 END) AS zeros,
        |    (sum((1::HUGEINT) << (61 - r)))::DOUBLE AS s
        |  FROM kfull GROUP BY k),
        |kest AS (SELECT k, CASE WHEN raw <= 40.0 AND zeros > 0
        |    THEN 16.0 * ln(16.0 / zeros) ELSE raw END AS e
        |  FROM (SELECT k, zeros,
        |      0.673::DOUBLE * 16 * 16 * pow(2.0, 61.0) / s AS raw FROM kstat)),
        |top1 AS (SELECT k, floor(e*10000+0.5)/10000 AS e4 FROM kest
        |  ORDER BY e4 DESC, k LIMIT 1)
        |SELECT md5(fullhex.hx) AS export_md5,
        | (20 + 30*(SELECT count(*) FROM keys) + 18*2048)::BIGINT AS n_bytes,
        | (SELECT count(*) FROM keys)::BIGINT AS n_tracked,
        | top1.k::BIGINT AS top1_key, top1.e4 AS top1_est
        |FROM fullhex, top1""".stripMargin
  )
}
