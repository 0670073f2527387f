package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan guards: these assert the *scale* properties — pushdown,
  * broadcast, bounded top-n, partial aggregation, whole-stage codegen —
  * so a regression that silently de-optimizes a plan fails CI, not a
  * 100 TB run. */
class PlanSpec extends AnyFunSuite with CacheHygiene {

  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("t34: unigram census is one exchange; encode stays narrow") {
    // the tokenize-the-corpus shape at 100 TB: scan -> project (the
    // Viterbi UDF — the honest-UDF case, like Bpe's) -> partial agg ->
    // ONE hash exchange on lang -> final agg. A second exchange or a
    // sort here would mean the tokenizer added a corpus-sized shuffle.
    val p = plan("t34_unigram_tokens")
    val body = p.split("TakeOrderedAndProject|Sort ").head
    val nEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nEx == 1, s"expected exactly 1 census exchange, got $nEx:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregation around the exchange:\n$p")
    assert(!body.contains("Exchange rangepartitioning"),
      s"encode/census must not range-shuffle the corpus:\n$p")
  }

  test("t38: byte-BPE census is one exchange; encode stays narrow") {
    // the t34/t12 discipline for the fourth family: scan -> project
    // (the tokenCount UDF — the honest-UDF case) -> partial agg -> ONE
    // hash exchange on lang -> final agg; a second exchange or an
    // in-body sort would mean the tokenizer added a corpus shuffle.
    // (trainDistributed's 48 rounds run during query CONSTRUCTION and
    // are not part of this plan — their per-round shape is the gated
    // t12c profile.)
    val p = plan("t38_bytebpe_tokens")
    val body = p.split("TakeOrderedAndProject|Sort ").head
    val nEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nEx == 1, s"expected exactly 1 census exchange, got $nEx:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final aggregation around the exchange:\n$p")
    assert(!body.contains("Exchange rangepartitioning"),
      s"census must not range-shuffle the corpus:\n$p")
  }

  test("m19: audio cluster census reads checkpointed tables only (decode + CC done upfront)") {
    // the cluster-front plan at 100 TB: by the time the returned frame
    // executes, the decode pass and every CC round already ran
    // (checkpointed during construction) — the remaining plan is the
    // id-universe/label join + the census aggregate over
    // fingerprint-table-sized inputs. No mapPartitions decode may leak
    // into it, and it must stay a bounded join+agg shape.
    val p = plan("m19_audio_dup_clusters")
    assert(!p.contains("SerializeFromObject"),
      s"the decode mapPartitions leaked past the checkpoint:\n$p")
    // 6 hash exchanges is the measured warm-start composition shape
    // (ids dedup + ids⋈assign + probe-labels⋈quotient-reps + census) —
    // every exchanged table is fingerprint/label-sized, never media
    // bytes; the guard is against growth, not the count itself
    val nEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nEx <= 6, s"cluster census grew extra shuffles ($nEx > 6):\n$p")
    assert("Exchange rangepartitioning".r.findAllIn(p).size <= 1,
      s"only the final result order may range-shuffle:\n$p")
  }

  test("m14: video dedup decodes once (checkpointed fingerprints), no extra shuffles") {
    // the inverted-index pair join at 100 TB: the DECODE pass is the
    // dominant cost and the fingerprint table is referenced four times
    // downstream (census twice, both self-join sides) — Spark does not
    // reuse the RDD-scan exchange across those references (measured:
    // four full decode passes before videoDupPairs checkpointed the
    // distinct). The plan must read the CHECKPOINTED rdd, never the
    // mapPartitions decode directly, and pair generation must not grow
    // shuffles beyond census + join-key + pair-agg.
    val p = plan("m14_video_dedup")
    assert("Exchange rangepartitioning".r.findAllIn(p).size == 1,
      s"only the final result order may range-shuffle:\n$p")
    val nEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(nEx <= 5, s"pair generation grew extra shuffles ($nEx > 5):\n$p")
    assert(!p.contains("SerializeFromObject"),
      s"the decode mapPartitions leaked past the checkpoint into the pair plan:\n$p")
  }

  test("q02: filters are pushed to the parquet scan") {
    val p = plan("q02_scan_filter_count")
    assert(p.contains("PushedFilters:") && p.contains("GreaterThan(l_quantity,45.0)"),
      s"filter not pushed:\n$p")
  }

  test("q02: scan reads only the filtered columns (column pruning)") {
    val p = plan("q02_scan_filter_count")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_comment"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("q04: dimension join uses BroadcastHashJoin (no shuffle of lineitem)") {
    val p = plan("q04_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), "dimension join degraded to SMJ")
  }

  test("q05: top-n compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("q05_topn")
    assert(p.contains("TakeOrderedAndProject"), s"expected bounded top-n:\n$p")
  }

  test("q01: aggregation is partial -> final (map-side combine)") {
    val p = plan("q01_tpch_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected partial+final HashAggregate:\n$p")
    // AQE's unexecuted adaptive plan reports 0 codegen subtrees; inspect
    // the static plan on a SCRATCH session — flipping AQE on the shared
    // session races parallel suites' mid-flight plans
    val scratch = spark.newSession()
    scratch.conf.set("spark.sql.adaptive.enabled", "false")
    val cg = SparkEntry.queries("q01_tpch_agg")(scratch, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.CodegenMode)
    val found = "Found (\\d+) WholeStageCodegen".r.findFirstMatchIn(cg).map(_.group(1).toInt)
    assert(found.exists(_ >= 1), s"aggregation fell out of codegen:\n${cg.take(400)}")
  }

  test("sk03: sketch aggregator runs as ObjectHashAggregate partial+final") {
    val p = plan("sk03_most_frequent_sketch")
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"sketch agg should be partial+final ObjectHashAggregate:\n$p")
  }

  test("a01: ANN query broadcasts the query vectors, not the corpus") {
    val p = plan("a01_ann_bruteforce")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast of query set:\n$p")
  }

  test("d07: decontamination joins the benchmark set by broadcast (corpus unshuffled)") {
    val p = plan("d07_contamination")
    assert(p.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$p")
  }

  test("d09: bloom probe is a plan-embedded filter feeding the confirm join") {
    val p = plan("d09_bloom_decontaminate")
    // the bitset probe must be a Filter expression (bloom_filter_might_contain
    // over the binary literal), not a join — rows that fail it never reach
    // the exact confirm join
    assert(p.contains("might_contain"), s"bloom probe missing from plan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"exact confirm join not broadcast:\n$p")
  }

  test("q27: downstream per-key aggregate reuses AsofJoinExec's exchange") {
    // AsofJoinExec declares outputPartitioning = left partitioning
    // (hash on the join key): a groupBy on that key must NOT re-shuffle
    // the join output — only the two input-side exchanges may appear.
    import org.apache.spark.sql.functions._
    val e = Tables.events(spark, sf)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val agg = graft.operators.Joins.asofJoinNative(p, c, "user_id", "ts", "ts", Seq("event_id"))
      .groupBy(col("user_id")).agg(count(col("asof")).as("n_matched"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"native asof not planned:\n$plan")
    val nExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(nExchanges == 2,
      s"expected 2 input-side exchanges, found $nExchanges (exchange not reused):\n$plan")
  }

  test("sk11: sampleTotal plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("sk11_sample_total")
    assert(p.contains("TakeOrderedAndProject"),
      s"exact-k sample degraded to a global sort:\n$p")
  }

  test("p11: weighted sample races in TakeOrderedAndProject (no global sort)") {
    // the inner ES top-k must be per-partition-bounded; the outer
    // orderBy(doc_id) re-sorts only the k surviving rows
    val p = plan("p11_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"weighted sample degraded to a global sort:\n$p")
  }

  test("p13: per-class weighted sample keeps a partial WindowGroupLimit below the shuffle") {
    // map tasks must forward at most k rows per class, not the corpus
    val p = plan("p13_weighted_per_class")
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"no map-side group limit:\n$p")
    assert("WindowGroupLimit .*Final".r.findFirstIn(p).isDefined)
  }

  test("p12: temperature-mix rates broadcast; corpus side never sort-merges") {
    // the per-class rate table is class-cardinality-sized: it must ride
    // a broadcast join; an SMJ here would shuffle the whole corpus
    val p = plan("p12_temperature_mix")
    assert(p.contains("BroadcastHashJoin"), s"rates not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus shuffled for the rate join:\n$p")
  }

  test("d15: fuzzy decontamination broadcasts the benchmark side") {
    // corpus-side candidate generation must ride a broadcast of the
    // banded benchmark — a shuffle here would move the whole corpus
    val p = plan("d15_fuzzy_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"benchmark band join not broadcast:\n$p")
  }

  test("d02: LSH verify join semi-prunes the shingle table to candidate ids") {
    // without the prune, both fetch joins shuffle every document's
    // shingle arrays; with it, only near-miss docs' shingles move
    val p = plan("d02_minhash_lsh")
    assert(p.contains("LeftSemi"), s"no semi-join prune before verify:\n$p")
  }

  test("s09: lang filter prunes partitions at plan time (PartitionFilters)") {
    val p = plan("s09_partitioned_write")
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("lang"),
      s"lang filter did not become a partition filter:\n$p")
    assert(scanLine.contains("IN (en,de)") || scanLine.contains("IN (de,en)"),
      s"expected lang IN pruning predicate, got: $scanLine")
    // and the filter must be PURELY partition-level: nothing to evaluate
    // per-row (DataFilters) or push into the parquet reader (PushedFilters)
    assert(scanLine.contains("DataFilters: []") &&
      scanLine.contains("PushedFilters: []"),
      s"lang filter leaked out of the partition layer: $scanLine")
  }

  test("q33: selective filters are pushed to all scans; top-10 is bounded") {
    val p = plan("q33_tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), s"expected bounded top-n:\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate")
      || p.contains("GreaterThan(l_shipdate"), s"l_shipdate not pushed:\n$p")
    assert(p.contains("LessThan(o_orderdate"), s"o_orderdate not pushed:\n$p")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), s"segment not pushed:\n$p")
  }

  test("q34: fixed-size dim chain broadcasts; fact joins stay shuffles") {
    val p = plan("q34_tpch_q5")
    assert(p.contains("BroadcastHashJoin"), s"dim chain not broadcast:\n$p")
    // the two fact-fact joins (l⋈o, ⋈c) must NOT have been force-broadcast:
    // at 100 TB they are shuffle joins; locally AQE may pick broadcast for
    // the post-filter orders side, so just require the plan executes the
    // broadcast for supplier chain without a cartesian anywhere
    assert(!p.contains("CartesianProduct"), s"cartesian in Q5 plan:\n$p")
  }

  test("q36: lineitem aggregates BEFORE any join (HAVING prunes pre-join)") {
    val p = plan("q36_tpch_q18")
    // the sum_qty > 300 filter must sit between the aggregate and the
    // joins — i.e. the aggregate is not above any join in the plan text
    // (joins appear earlier in toString than their children)
    val aggIdx = p.indexOf("HashAggregate")
    val joinIdx = math.max(p.indexOf("BroadcastHashJoin"),
      math.max(p.indexOf("SortMergeJoin"), p.indexOf("ShuffledHashJoin")))
    assert(aggIdx >= 0 && joinIdx >= 0, s"missing agg or join:\n$p")
    assert(joinIdx < aggIdx,
      s"aggregate should be BELOW the joins (agg-before-join):\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 not bounded:\n$p")
  }

  test("q37: return-flag and date filters push to the scans; nation broadcasts") {
    val p = plan("q37_tpch_q10")
    assert(p.contains("EqualTo(l_returnflag,R)"), s"returnflag not pushed:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"), s"orderdate not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"nation dim not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 not bounded:\n$p")
  }

  test("q38: EXISTS/NOT EXISTS plan as streamed semi/anti joins; supplier broadcasts") {
    val p = plan("q38_tpch_q21")
    // the self-join correlation must become LEFT SEMI + LEFT ANTI — a
    // rewrite through a full join + dedup would materialize per-order
    // supplier pairs, quadratic in lines-per-order at scale
    assert(p.contains("LeftSemi"), s"EXISTS did not plan as a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not plan as an anti join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"supplier dim not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 not bounded:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in Q21 plan:\n$p")
    // BOTH fault filters (l1's and the anti-join side l3's) push into
    // their lineitem scans — one occurrence would mean the anti side
    // scans the full fact
    assert("EqualTo\\(l_returnflag,R\\)".r.findAllIn(p).size >= 2,
      s"expected returnflag pushed into both fault scans:\n$p")
  }

  test("q40: the Q21 aggregate rewrite scans lineitem exactly once") {
    val p = plan("q40_tpch_q21_agg")
    val scans = "lineitem\\.parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected ONE lineitem scan, found $scans:\n$p")
    // and the (orderkey, suppkey) rollup map-side combines before its
    // exchange — the fact crosses the wire pre-aggregated. Match the
    // rollup's OWN partial stage (partial_count of the fault CASE), not
    // just any HashAggregate pair: the final s_name agg alone would
    // satisfy a bare >= 2 count and mask a raw-fact shuffle
    assert(p.contains("partial_count(CASE WHEN"),
      s"per-(order,supp) rollup lost its partial stage:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-20 not bounded:\n$p")
    // the per-order stats are a second HASH aggregate, not window sums:
    // the window's per-order sort is what made this form lose to q38 at
    // sf10 (11.0 s vs 7.7 s) — no sort may appear before the final top-20
    assert(!p.contains("Window"), s"per-order stats regressed to a window:\n$p")
  }

  test("q39: brand prune is a broadcast join below the agg; agg below the join-back") {
    val p = plan("q39_tpch_q17")
    assert(p.contains("EqualTo(p_brand,Brand#1)"), s"brand not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part prune not broadcast:\n$p")
    // the per-part avg must aggregate BELOW the join-back (map-side
    // combinable to one row per part), never join raw fact to raw fact
    val aggIdx = p.indexOf("partial_avg")
    val joinIdx = p.indexOf("Join")
    assert(aggIdx >= 0 && joinIdx >= 0 && joinIdx < aggIdx,
      s"per-part avg should sit below the join-back:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in Q17 plan:\n$p")
  }

  test("q41: orders pre-aggregates BELOW the outer join; status filter pushed") {
    val p = plan("q41_tpch_q13")
    // the per-customer count must sit under the LEFT OUTER join — the
    // shuffle moves one row per customer, not one per order; the naive
    // join-then-count form would shuffle the whole orders table
    assert(p.contains("LeftOuter"), s"customer join lost outer semantics:\n$p")
    val joinIdx = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin).*LeftOuter".r
      .findFirstMatchIn(p).map(_.start).getOrElse(-1)
    val aggIdx = "HashAggregate\\(keys=\\[o_custkey".r
      .findFirstMatchIn(p).map(_.start).getOrElse(-1)
    assert(joinIdx >= 0 && aggIdx >= 0 && joinIdx < aggIdx,
      s"per-customer count should aggregate below the outer join:\n$p")
    assert(p.contains("Not(EqualTo(o_orderstatus,F))"),
      s"status filter not pushed to the orders scan:\n$p")
  }

  test("q42: scalar avg broadcasts as a 1-row BNLJ; NOT EXISTS plans LEFT ANTI") {
    val p = plan("q42_tpch_q22")
    // the decorrelated average must never shuffle the customer side —
    // a 1-row broadcast nested loop is the right physical shape for a
    // scalar-subquery comparison
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"scalar avg did not broadcast:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not plan as anti join:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"recency filter not pushed to the orders scan:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in Q22 plan:\n$p")
  }

  test("q43: one lineitem scan, shipdate pushed, nation pair folded via broadcast") {
    val p = plan("q43_tpch_q7")
    val scans = "lineitem\\.parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected ONE lineitem scan, found $scans:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate not pushed:\n$p")
    // nation→supplier and supplier→lineitem both ride broadcasts, so the
    // 2-of-25-nations selectivity prunes the fact at its FIRST join
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"nation-pair dims not folded via broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in Q7 plan:\n$p")
  }

  test("q44: EXISTS plans LEFT SEMI; returnflag pushed into the semi side") {
    val p = plan("q44_tpch_q4")
    assert(p.contains("LeftSemi"), s"EXISTS did not plan as a semi join:\n$p")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"returnflag not pushed into the lineitem scan:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"order window not pushed:\n$p")
  }

  test("q45: both CASE branches aggregate in ONE partial+final pass") {
    val p = plan("q45_tpch_q12")
    // two conditional sums must share a single aggregate — two partial_sum
    // functions inside one HashAggregate, not two scans or a pivot
    val partial = "partial_sum\\(CASE WHEN".r.findAllIn(p).size
    assert(partial >= 2, s"expected both CASE sums in the partial stage:\n$p")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"fact scanned more than once:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"ship window not pushed:\n$p")
  }

  test("q46: part broadcasts; numerator and denominator share one aggregate") {
    val p = plan("q46_tpch_q14")
    assert(p.contains("BroadcastHashJoin"), s"part dim not broadcast:\n$p")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"fact scanned more than once:\n$p")
  }

  test("q47: OR-of-ANDs rides the broadcast join; coarse envelopes push to scans") {
    val p = plan("q47_tpch_q19")
    assert(p.contains("BroadcastHashJoin"), s"part dim not broadcast:\n$p")
    // each side's single-side envelope must reach its OWN scan — without
    // it, the fact scan reads every row only to drop 99% at the join
    assert(p.contains("In(p_brand"), s"brand set not pushed to part scan:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_quantity,1.0)") &&
      p.contains("LessThanOrEqual(l_quantity,30.0)"),
      s"quantity hull not pushed to lineitem scan:\n$p")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"fact scanned more than once:\n$p")
  }

  test("q48: correlated min decorrelates to ONE window pass, dims broadcast") {
    val p = plan("q48_tpch_q2")
    // the min-per-part evaluates as a window over the dim-pruned fact:
    // one fact scan, one hash shuffle on p_partkey — NOT a second
    // aggregate-and-join-back scan of lineitem
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"fact scanned more than once (agg+join-back decorrelation?):\n$p")
    assert(p.contains("Window"), s"min-per-group not a window:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"a dim join degraded to SMJ:\n$p")
  }

  test("q49/q50: global threshold derives from the group agg — fact scanned once") {
    // the grand total / max re-aggregates the per-supplier result, so
    // the physical plan must REUSE the aggregate's exchange instead of
    // scanning lineitem twice. AQE defers reuse to runtime; assert on
    // the static plan of a non-adaptive scratch session.
    val scratch = spark.newSession()
    scratch.conf.set("spark.sql.adaptive.enabled", "false")
    for (q <- Seq("q49_tpch_q11", "q50_tpch_q15")) {
      val p = SparkEntry.queries(q)(scratch, sf)
        .queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        s"$q: threshold branch does not reuse the aggregate exchange:\n$p")
      assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
        s"$q: fact scanned more than once:\n$p")
    }
  }

  test("q51: NOT IN plans as broadcast anti join; distinct dedups map-side") {
    val p = plan("q51_tpch_q16")
    assert(p.contains("LeftAnti"), s"exclusion not an anti join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"part/exclusion join degraded to SMJ:\n$p")
    // count(DISTINCT) must partial-deduplicate (group, suppkey) pairs
    // before the exchange — the shuffle moves distinct pairs, not rows
    assert("HashAggregate".r.findAllIn(p).size >= 3,
      s"no map-side distinct stage:\n$p")
  }

  test("q52: nested INs plan as a semi-join chain, fact scanned once") {
    val p = plan("q52_tpch_q20")
    assert("LeftSemi".r.findAllIn(p).size >= 2,
      s"expected two semi joins (part slice + qualified suppliers):\n$p")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"fact scanned more than once:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"ship window not pushed to the fact scan:\n$p")
  }

  test("q53: share is one conditional-sum pass; only the two SF-scaled joins shuffle") {
    val p = plan("q53_tpch_q8")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"fact scanned more than once (numerator rescan?):\n$p")
    // part/supplier/nation/region must all ride broadcasts — the only
    // sort-merge-eligible joins are lineitem⋈orders and orders⋈customer
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"a fixed-size dim lost its broadcast:\n$p")
  }

  test("q54: profit aggregates map-side; part cost rides the broadcast") {
    val p = plan("q54_tpch_q9")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"fact scanned more than once:\n$p")
    assert(p.contains("partial_sum"), s"no map-side combine:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part dim not broadcast:\n$p")
  }

  test("q55: every predicate reaches the scan; zero-shuffle except the 1-row gather") {
    // plan.toString truncates the PushedFilters list at 100 chars;
    // formatted explain prints it in full
    val p = SparkEntry.queries("q55_tpch_q6")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    for (f <- Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.05)", "LessThanOrEqual(l_discount,0.07)",
        "LessThan(l_quantity,24.0)"))
      assert(p.contains(f), s"predicate $f not pushed to the scan:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"embarrassingly-parallel scan grew a hash shuffle:\n$p")
    assert(p.contains("partial_sum"), s"no map-side combine:\n$p")
  }

  test("p03: per-key cap pushes a partial WindowGroupLimit below the shuffle") {
    // without the partial group-limit, every row shuffles to its key's
    // partition before the rank filter — the difference between moving
    // top-51-per-source and moving the whole corpus
    val p = plan("p03_cap_per_source")
    assert("WindowGroupLimit .*Partial".r.findFirstIn(p).isDefined,
      s"no map-side group limit:\n$p")
    assert("WindowGroupLimit .*Final".r.findFirstIn(p).isDefined)
  }

  test("d12: one gram generation, one gram exchange; count rides a gram window") {
    // r16 shape: duplicated positions come from count(*) over a
    // gram-partitioned window riding ONE exchange of the (id, pos,
    // gram8) rows — the former count-aggregate + semi-join shape ran the
    // corpus-scan → window-generation subtree twice (the gram gen alone
    // was a third of d12's runtime). Pin: exactly one corpus scan, one
    // gram-keyed exchange + one id-keyed (islands) exchange, the window
    // count keyed on the gram, and grams hashed to longs before the
    // exchange (the 100 TB shuffle-bytes switch).
    val p = plan("d12_dup_spans")
    assert("FileScan parquet".r.findAllIn(p).size == 1,
      s"gram generation should scan the corpus exactly once:\n$p")
    assert("Exchange hashpartitioning\\(gram".r.findAllIn(p).size == 1,
      s"expected exactly one gram-keyed exchange:\n$p")
    assert("windowspecdefinition\\(gram".r.findFirstIn(p).isDefined,
      s"dup-position filter should be a gram-partitioned window count:\n$p")
    assert(p.contains("xxhash64"),
      s"grams must hash to longs before the exchange:\n$p")
  }

  test("t11: LM vocab scalar broadcasts; no UDF anywhere in the plan") {
    val p = plan("t11_lm_score")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"vocab-size scalar should cross in as a broadcast:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      s"UDF leaked into the LM hot path:\n$p")
  }

  test("p07: split assignment is narrow — no exchange before the aggregate") {
    // md5-prefix bucketing must stay inside the scan's codegen stage;
    // the only exchange is the groupBy's
    val df = SparkEntry.queries("p07_train_split")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p).size
    // one shuffle for groupBy(split,lang), one for the final orderBy
    assert(exchanges <= 2, s"split assignment introduced extra exchanges:\n$p")
    assert(!p.contains("ScalaUDF"), s"split must be pure column ops:\n$p")
  }

  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    // THE biggest 100 TB scan lever after static pruning: a filter that
    // only exists on the dim side (here lang names via a join) must still
    // prune the partitioned fact's directories — Catalyst injects a
    // dynamicpruning#N subquery into the scan's PartitionFilters, so only
    // the joined partitions' files are ever opened
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "target/qtmp/dpp_docs"
    Tables.documents(spark, sf)
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    // dim must be a REAL relation: a local Seq constant-folds to a bare
    // LocalRelation, leaving no selective Filter node for the DPP rule
    // to derive a pruning subquery from
    val dimDir = "target/qtmp/dpp_dim"
    Seq(("en", 1), ("de", 2), ("es", 3), ("fr", 4), ("zh", 5))
      .toDF("lang", "lang_id").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val q = spark.read.parquet(dir)
      .join(dim.filter(col("lang_id") === 1), Seq("lang"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"no dynamic partition pruning subquery in the scan:\n$p")
    val got = q.collect()
    assert(got.length == 1 && got(0).getString(0) == "en")
  }

  test("runtime bloom filter: selective dim join injects a fact-side prefilter") {
    // the runtime twin of d09's explicit bloom: for a shuffle join with a
    // selective creation side, Catalyst builds a bloom filter over the dim
    // keys at runtime and applies might_contain on the fact BEFORE its
    // exchange — rows for absent keys never shuffle. Scratch session:
    // thresholds lowered so test-scale tables qualify, broadcasts off so
    // the join keeps a fact-side exchange worth pruning.
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1KB")
    import org.apache.spark.sql.functions._
    val fact = Tables.lineitem(s, sf).select(col("l_orderkey"), col("l_quantity"))
    val dim = Tables.orders(s, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val q = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n"))
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("might_contain"),
      s"no runtime bloom filter on the fact side:\n$p")
    assert(q.head().getLong(0) > 0)
  }

  test("c03: EWMA runs in ONE key-partitioned exchange (window, no join)") {
    val p = plan("c03_ewma")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"EWMA must be a pure window plan:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected 1 keyed exchange, got $exchanges:\n$p")
  }

  test("c05/c09: per-group stats broadcast back; corpus never sort-merges") {
    for (q <- Seq("c05_zscore", "c09_robust_scale")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: stats not broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q: corpus shuffled for a join:\n$p")
    }
  }

  test("c07: rolling window is a RANGE frame in one keyed exchange") {
    val p = plan("c07_rolling_1h")
    assert(p.contains("RangeFrame"), s"frame is not RANGE:\n$p")
    assert(!p.contains("Join"), s"rolling window must not join:\n$p")
  }

  test("c08: funnel folds in ONE corpus scan, one keyed exchange, no joins") {
    val p = plan("c08_funnel")
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 1,
      s"funnel rescanned the corpus:\n$p")
    assert(!p.contains("Join"), s"one-pass funnel must not join:\n$p")
  }

  test("d21: containment joins the inverted index; no cartesian product") {
    val p = plan("d21_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"containment must pair only gram-sharing docs:\n$p")
  }

  test("p16: bootstrap is explode + ONE group aggregate per stage (no self-join)") {
    val p = plan("p16_bootstrap_ci")
    assert(p.contains("Generate explode"), s"replica explode missing:\n$p")
    assert(!p.contains("CartesianProduct"), s"bootstrap must not cross-join:\n$p")
  }

  test("q56: grouping sets compile to ONE scan + Expand (no rescan per set)") {
    val p = plan("q56_grouping_sets")
    assert(p.contains("Expand"), s"no Expand node:\n$p")
    assert(p.linesIterator.count(_.contains("FileScan parquet")) == 1,
      s"grouping sets rescanned the table:\n$p")
  }

  test("d24: shuffle-regime confirm join never broadcasts the exact set") {
    // the bloom's true regime: the bitset prunes in the scan's codegen
    // (BloomFilterMightContain), and the exact confirm is an h8-keyed
    // shuffled hash join — no broadcast of the benchmark set anywhere
    val p = plan("d24_bloom_shuffle_confirm")
    assert(p.contains("bloom_filter_contains") || p.contains("BloomFilterMightContain")
        || p.contains("might_contain"),
      s"bloom pre-probe missing from the corpus scan:\n$p")
    assert(p.contains("ShuffledHashJoin"), s"confirm join must shuffle:\n$p")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastExchange"),
      s"shuffle regime must not broadcast the exact set:\n$p")
  }

  test("EntityResolution.resolve: regime + salt dispatch off the block census") {
    import org.apache.spark.sql.functions._
    import graft.operators.EntityResolution
    val spark2 = spark; import spark2.implicits._
    // 400 entities over 40 blocks, one name column — broadcast-sized
    val even = (0 until 400).map(i => (i.toLong, s"name $i x", s"b${i % 40}"))
      .toDF("id", "nm", "blk")
    val (p1, d1) = EntityResolution.resolveWithDecision(even, "id", "nm", "blk", 0.9)
    assert(!d1.useShuffleJoin && d1.saltFactor == 1 && d1.probeParallelism > 0,
      s"broadcast-sized table must take the broadcast regime: $d1")
    assert(p1.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    // constructed switch: drop the threshold under the measured footprint
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "1024")
      val (p2, d2) = EntityResolution.resolveWithDecision(even, "id", "nm", "blk", 0.9)
      assert(d2.useShuffleJoin && d2.saltFactor == 1,
        s"even blocks over-threshold must take UNSALTED sort-merge: $d2")
      val pl2 = p2.queryExecution.executedPlan.toString
      assert(pl2.contains("SortMergeJoin") && !pl2.contains("BroadcastHashJoin"),
        s"expected SMJ regime:\n$pl2")
      // hot block: 300 of 400 rows in ONE block -> its n^2 dominates and
      // the dispatcher must salt the self-join
      val skewed = (0 until 400).map(i =>
        (i.toLong, s"name $i x", if (i < 300) "hot" else s"b${i % 40}"))
        .toDF("id", "nm", "blk")
      val (p3, d3) = EntityResolution.resolveWithDecision(skewed, "id", "nm", "blk", 0.9)
      assert(d3.useShuffleJoin && d3.saltFactor > 1,
        s"hot block must trigger salting: $d3")
      p3.queryExecution.executedPlan // planable
    } finally spark.conf.set(key, prev)
  }

  test("perplexityBucketsAuto: window below the ceiling, prefix-sum above") {
    import graft.operators.LanguageModel
    val docs = Tables.documents(spark, sf)
    // default ceiling: every sandbox class is tiny -> the window form
    val pw = LanguageModel.perplexityBucketsAuto(docs, "doc_id", "text", "lang")
      .queryExecution.executedPlan.toString
    assert(pw.contains("Window"), s"below-ceiling must take the window form:\n$pw")
    // constructed ceiling of 1 row/class -> the prefix-sum form (no
    // Window node anywhere; rank comes from the offset broadcast)
    val ps = LanguageModel.perplexityBucketsAuto(docs, "doc_id", "text", "lang",
        windowCeiling = 1L)
      .queryExecution.executedPlan.toString
    assert(!ps.contains("Window"), s"above-ceiling must drop the window:\n$ps")
    spark.catalog.clearCache() // the scalable form's range-sort persist
  }

  test("q21Auto: aggregate rewrite below the fact ceiling, semi/anti above") {
    import graft.operators.CoreQueries
    // default ceiling: the sandbox fact is tiny -> the rewrite (no semi
    // or anti join anywhere in the tree; ONE lineitem scan)
    val agg = CoreQueries.q21Auto(spark, sf).queryExecution.executedPlan.toString
    assert(!agg.contains("LeftSemi") && !agg.contains("LeftAnti"),
      s"below-ceiling must take the aggregate rewrite:\n$agg")
    // constructed 1-row ceiling -> the SAME call flips to semi/anti
    val sa = CoreQueries.q21Auto(spark, sf, aggCeiling = 1L)
      .queryExecution.executedPlan.toString
    assert(sa.contains("LeftSemi") && sa.contains("LeftAnti"),
      s"above-ceiling must take the semi/anti form:\n$sa")
  }

  test("groupQuantilesAuto: regimes agree on null/NaN rows and all-null groups") {
    import graft.operators.Analytics
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("b", Some(Double.NaN)), ("b", None))
      .toDF("k", "v").select(col("k"), col("v").cast("double").as("v"))
    // both regimes drop null/NaN values and omit the all-null/NaN group
    // entirely — the ceiling flip must never change the ROW SET or
    // surface a NaN (Spark sorts NaN greatest, poisoning percentiles)
    def rows(exactCeiling: Long) =
      Analytics.groupQuantilesAuto(df, Seq("k"), "v", Seq(0.5, 1.0),
          exactCeiling = exactCeiling)
        .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val exact = rows(1000000L)
    val gk = rows(1L)
    assert(exact.keySet == Set("a") && gk.keySet == Set("a"),
      s"all-null/NaN group must be absent in BOTH regimes: $exact / $gk")
    assert(!exact("a").exists(_.isNaN) && !gk("a").exists(_.isNaN))
    assert(exact("a")(1) == 3.0 && gk("a")(1) == 3.0,
      "q=1.0 must be the max of the non-null values in both regimes")
  }

  test("groupQuantilesAuto: ceiling census runs over the filtered row set") {
    import graft.operators.Analytics
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // group "a": 2 real values + 4 NaN rows. The regimes only ever see
    // the 2 real rows, so a ceiling of 3 must pick the EXACT regime —
    // a census over the unfiltered frame would count 6 and flip to GK
    val df = (Seq(("a", 1.0), ("a", 4.0)) ++ Seq.fill(4)(("a", Double.NaN)))
      .toDF("k", "v").select(col("k"), col("v").cast("double").as("v"))
    val auto = Analytics.groupQuantilesAuto(df, Seq("k"), "v", Seq(0.75),
      exactCeiling = 3L)
    val plan = auto.queryExecution.analyzed.toString
    assert(plan.contains("percentile"),
      s"census must count the filtered rows (2 <= 3 -> exact):\n$plan")
    // and the exact regime interpolates: p75 of [1,4] = 3.25 (a GK
    // sketch could only return an actual stream member, 1 or 4)
    val got = auto.collect().head.getSeq[Double](1).head
    assert(got == 3.25, s"exact percentile must interpolate: $got")
  }

  test("gkQuantilesByKey: two-phase object hash aggregate, no per-group sort") {
    import graft.operators.Analytics
    import org.apache.spark.sql.functions.{col, length}
    val vals = Tables.documents(spark, sf)
      .select(col("lang"), length(col("text")).as("v"))
    val plan = Analytics.gkQuantilesByKey(vals, Seq("lang"), "v", Seq(0.5, 0.9))
      .queryExecution.executedPlan.toString
    // the 100 TB claim: partial GK summaries merge map-side through an
    // ObjectHashAggregate pair — group SIZE never becomes a task's sort
    assert(plan.contains("ObjectHashAggregate"),
      s"keyed GK must plan as an object hash aggregate:\n$plan")
    assert(!plan.contains("Sort "),
      s"keyed GK must not sort any group's values:\n$plan")
    val phases = "ObjectHashAggregate".r.findAllIn(plan).length
    assert(phases >= 2, s"expected partial+final aggregate phases, got $phases")
  }

  test("groupQuantilesAuto: exact percentile below the ceiling, GK sketch above") {
    import graft.operators.Analytics
    import org.apache.spark.sql.functions.{col, length}
    val vals = Tables.documents(spark, sf)
      .select(col("lang"), length(col("text")).as("v"))
    // default ceiling: sandbox groups are tiny -> exact interpolating form
    val exact = Analytics.groupQuantilesAuto(vals, Seq("lang"), "v", Seq(0.5, 0.9))
    val pe = exact.queryExecution.analyzed.toString
    assert(pe.contains("percentile"),
      s"below-ceiling must take the exact percentile form:\n$pe")
    // constructed 1-row ceiling -> the SAME call flips to the GK aggregate
    val gk = Analytics.groupQuantilesAuto(vals, Seq("lang"), "v", Seq(0.5, 0.9),
      exactCeiling = 1L)
    val pg = gk.queryExecution.analyzed.toString.toLowerCase
    assert(!pg.contains("percentile(") && pg.contains("approxquantiles"),
      s"above-ceiling must take the GK aggregator:\n$pg")
    // both regimes answer: per-lang arrays of the two quantiles
    assert(exact.count() == gk.count() && gk.count() == 5)
  }

  test("bloomDecontaminate auto regime: dispatch flips on the broadcast threshold") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    def planOf(confirm: String): String = {
      val (out, h) = graft.dedup.Dedup.bloomDecontaminate(
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id",
        docs.filter(col("doc_id") % 2 === 0), "text", n = 8,
        numBits = 1L << 19, confirm = confirm)
      val s = out.queryExecution.executedPlan.toString
      h.unpersist(); s
    }
    // default threshold (10 MB): the measured gram count is tiny -> the
    // dispatcher must pick the broadcast confirm
    assert(planOf("auto").contains("BroadcastHashJoin"),
      "auto must broadcast a threshold-sized benchmark set")
    // constructed input for the switch: drop the session threshold below
    // the measured set footprint -> the SAME call must flip to shuffle
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "1024")
      val p = planOf("auto")
      assert(p.contains("ShuffledHashJoin") && !p.contains("BroadcastHashJoin"),
        s"auto must shuffle once the set exceeds the threshold:\n$p")
    } finally spark.conf.set(key, prev)
  }

  test("ivfTopKStore probe prunes the store's cell partition directories") {
    import org.apache.spark.sql.functions._
    val spark2 = spark; import spark2.implicits._
    val emb = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(j =>
        (if (j == (i % 4) * 2) 5f else 0f) + (i % 7) * 0.01f).toSeq)
    }.toDF("vec_id", "embedding")
    val cents = graft.ann.Ann.trainCentroidsReplay(emb, "vec_id", "embedding",
      nLists = 4, iters = 2, initIdx = Seq(0, 50, 100, 150))
    val path = java.nio.file.Files.createTempDirectory("ivfstore").toString
    graft.ann.Ann.buildIvfStore(emb, "vec_id", "embedding", path, cents)
    val queries = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val out = graft.ann.Ann.ivfTopKStore(spark, path, cents, queries,
      k = 5, nProbe = 2)
    val p = out.queryExecution.executedPlan.toString
    // the probed-cell literal list must land in the scan's PARTITION
    // filters (directory pruning — the segment layout's analog of
    // bucket pruning), not ride as a post-scan data filter
    assert(p.contains("PartitionFilters") &&
      "PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined,
      s"probed cells not pushed to partition pruning:\n$p")
    assert(out.count() > 0)
  }

  test("capped audio-index append: the store is never shuffled (batch-fp prune)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val spark2 = spark; import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("audidx").toString
    spark.range(0L, 2000L)
      .select(col("id"), (col("id") % 50).as("fp"))
      .write.parquet(s"$dir/fps/batch=base")
    val oldFps = spark.read.parquet(s"$dir/fps").drop("batch")
    val newFps = Seq((9001L, 3L), (9002L, 3L), (9003L, 7L)).toDF("id", "fp")
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false") // plain tree for the structural walk
      for (cap <- Seq(-1L, 10L, 0L)) {
        val plan = graft.multimodal.Multimodal
          .audioAppendPairs(oldFps, newFps, 1, cap)
          .queryExecution.executedPlan
        // the store may only reach a shuffle AFTER the batch broadcast
        // join pruned it: any Exchange whose subtree scans the store
        // parquet without an intervening broadcast join is the exact
        // O(store)-per-trigger regression this pins against
        val bad = plan.collect {
          case e: ShuffleExchangeExec
              if e.collect { case s: FileSourceScanExec => s }.nonEmpty &&
                e.collect { case j: BroadcastHashJoinExec => j }.isEmpty => e
        }
        assert(bad.isEmpty,
          s"cap=$cap shuffles the unpruned store:\n${bad.headOption.getOrElse(plan)}")
        assert(plan.collect { case j: SortMergeJoinExec => j }.isEmpty &&
          plan.collect { case j: ShuffledHashJoinExec => j }.isEmpty,
          s"cap=$cap join-shuffles the store:\n$plan")
      }
    } finally spark.conf.set(key, prev)
  }

  test("capped LSH-index append: the store is never shuffled (batch-bucket prune)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val spark2 = spark; import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    spark.range(0L, 2000L)
      .select(col("id"), (col("id") % 16).cast("int").as("band"),
        (col("id") % 50).as("h"))
      .write.parquet(s"$dir/bands/batch=base")
    spark.range(0L, 2000L)
      .select(col("id"), array(concat(lit("w"), col("id")),
        concat(lit("x"), col("id"))).as("sh"))
      .write.parquet(s"$dir/meta/batch=base")
    val oldBands = spark.read.parquet(s"$dir/bands").drop("batch")
    val oldMeta = spark.read.parquet(s"$dir/meta").drop("batch")
    val newBanded = Seq((9001L, 3, 3L), (9002L, 3, 3L), (9003L, 7, 7L))
      .toDF("id", "band", "h")
    val newMeta = Seq((9001L, Seq("w3", "x3")), (9002L, Seq("w3", "x3")),
      (9003L, Seq("w7"))).toDF("id", "sh")
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false") // plain tree for the structural walk
      for (cap <- Seq(-1L, 10L, 0L)) {
        val (pairs, _) = graft.dedup.Dedup.lshAppendPairs(
          oldBands, oldMeta, newBanded, newMeta, 0.5, cap)
        val plan = pairs.queryExecution.executedPlan
        // the store may only reach a shuffle AFTER a batch broadcast
        // join pruned it: any Exchange whose subtree scans the store
        // parquet without an intervening broadcast join is the exact
        // O(store)-per-trigger regression this pins against (the round-14
        // verdict's What's-wrong #1)
        val bad = plan.collect {
          case e: ShuffleExchangeExec
              if e.collect { case sc: FileSourceScanExec => sc }.nonEmpty &&
                e.collect { case j: BroadcastHashJoinExec => j }.isEmpty => e
        }
        assert(bad.isEmpty,
          s"cap=$cap shuffles the unpruned store:\n${bad.headOption.getOrElse(plan)}")
      }
    } finally spark.conf.set(key, prev)
  }

  test("capped Hamming-index append: the store is never shuffled (batch-bucket prune)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val spark2 = spark; import spark2.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hamidx").toString
    spark.range(0L, 2000L)
      .select(col("id"), (col("id") * 7L).as("sig"),
        (col("id") % 4).cast("int").as("band"), (col("id") % 50).as("h"))
      .write.parquet(s"$dir/bands/batch=base")
    val oldBands = spark.read.parquet(s"$dir/bands").drop("batch")
    val newBanded = Seq((9001L, 21L, 3, 3L), (9002L, 23L, 3, 3L),
      (9003L, 49L, 1, 7L)).toDF("id", "sig", "band", "h")
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false") // plain tree for the structural walk
      for (cap <- Seq(-1L, 10L, 0L)) {
        val (pairs, _) = graft.dedup.HammingIndex.hammingAppendPairs(
          oldBands, newBanded, maxHamming = 3, cap)
        val plan = pairs.queryExecution.executedPlan
        // same pin as the LSH append: any Exchange whose subtree scans
        // the store parquet without an intervening broadcast join is
        // the O(store)-per-trigger regression
        val bad = plan.collect {
          case e: ShuffleExchangeExec
              if e.collect { case sc: FileSourceScanExec => sc }.nonEmpty &&
                e.collect { case j: BroadcastHashJoinExec => j }.isEmpty => e
        }
        assert(bad.isEmpty,
          s"cap=$cap shuffles the unpruned store:\n${bad.headOption.getOrElse(plan)}")
      }
    } finally spark.conf.set(key, prev)
  }

  test("Hamming-append broadcast gate actually flips the batch join strategy") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val spark2 = spark; import spark2.implicits._
    val oldBands = spark.range(0L, 500L)
      .select(col("id"), (col("id") * 7L).as("sig"),
        (col("id") % 4).cast("int").as("band"), (col("id") % 50).as("h"))
    val newBanded = Seq((9001L, 21L, 3, 3L), (9002L, 23L, 3, 3L))
      .toDF("id", "sig", "band", "h")
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val aqe = "spark.sql.adaptive.enabled"
    val (pThr, pAqe) = (spark.conf.get(thr), spark.conf.get(aqe))
    try {
      spark.conf.set(thr, "-1"); spark.conf.set(aqe, "false")
      def bhjCount(broadcastBatch: Boolean): Int =
        graft.dedup.HammingIndex.hammingAppendPairs(oldBands, newBanded,
            maxHamming = 3, cap = 10L, broadcastBatch = broadcastBatch)
          ._1.queryExecution.executedPlan
          .collect { case j: BroadcastHashJoinExec => j }.size
      assert(bhjCount(true) > 0,
        "gate=broadcast regime lost its broadcast joins")
      assert(bhjCount(false) == 0,
        "gate=shuffle regime still broadcasts the batch side")
    } finally { spark.conf.set(thr, pThr); spark.conf.set(aqe, pAqe) }
  }

  test("LSH-append broadcast gate actually flips the batch join strategy") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val spark2 = spark; import spark2.implicits._
    val oldBands = spark.range(0L, 500L)
      .select(col("id"), (col("id") % 16).cast("int").as("band"),
        (col("id") % 50).as("h"))
    val oldMeta = spark.range(0L, 500L)
      .select(col("id"), array(concat(lit("w"), col("id"))).as("sh"))
    val newBanded = Seq((9001L, 3, 3L), (9002L, 3, 3L)).toDF("id", "band", "h")
    val newMeta = Seq((9001L, Seq("w3")), (9002L, Seq("w3"))).toDF("id", "sh")
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val aqe = "spark.sql.adaptive.enabled"
    val (pThr, pAqe) = (spark.conf.get(thr), spark.conf.get(aqe))
    try {
      // threshold off: ONLY the explicit hint can produce a broadcast
      // join, so presence/absence isolates the gate's decision
      spark.conf.set(thr, "-1"); spark.conf.set(aqe, "false")
      def bhjCount(broadcastBatch: Boolean): Int =
        graft.dedup.Dedup.lshAppendPairs(oldBands, oldMeta, newBanded,
            newMeta, 0.5, cap = 10L, broadcastBatch = broadcastBatch)
          ._1.queryExecution.executedPlan
          .collect { case j: BroadcastHashJoinExec => j }.size
      assert(bhjCount(true) > 0,
        "gate=broadcast regime lost its broadcast joins")
      assert(bhjCount(false) == 0,
        "gate=shuffle regime still broadcasts the batch side")
    } finally { spark.conf.set(thr, pThr); spark.conf.set(aqe, pAqe) }
  }
}
