package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.SqlBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter set membership built on Spark's OWN runtime-filter
  * machinery ([[BloomFilterAggregate]] / [[BloomFilterMightContain]] — the
  * expressions AQE injects for `spark.sql.optimizer.runtimeFilter.bloomFilter`),
  * exposed as first-class columns.
  *
  * Scale rationale: broadcasting a full membership set (e.g. every distinct
  * benchmark 8-gram for decontamination) costs O(set bytes) per executor and
  * a hash-table probe per row. The bloom form ships a fixed-size bitset
  * (1 MB covers ~1M items at 1% fp) embedded in the plan, probes with two
  * xxhash64 evaluations inside whole-stage codegen, and never false-negatives
  * — so `bloom-prefilter → exact confirm` is result-identical to the exact
  * join while the confirm join only ever sees the tiny might-contain
  * survivor set. That is the 100 TB decontamination shape.
  *
  * Reference: the amadeus reference has no bloom sink; closest is its
  * most_frequent/CountMin family (amadeus-streaming/src/count_min.rs) —
  * this exceeds it, following Spark's injected-runtime-filter pattern.
  */
object BloomFunctions {

  /** Aggregate a column into a serialized bloom filter (binary).
    * @param expectedItems sizing hint (distinct-ish count of the build side)
    * @param numBits       bitset size; ~8×expectedItems gives ~2% fp
    */
  def bloomAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    SqlBridge.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(SqlBridge.expression(c))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a built filter: false ⇒ definitely absent,
    * true ⇒ confirm exactly downstream. The serialized filter rides the
    * plan as a binary literal (broadcast with the task binary). */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    SqlBridge.column(
      BloomFilterMightContain(Literal(bloom, BinaryType),
        new XxHash64(Seq(SqlBridge.expression(c)))))

  /** Build a bloom filter from a single-column DataFrame, driver-side.
    * The aggregation is distributed (partial filters OR-merged); only the
    * final bitset lands on the driver. */
  def build(df: org.apache.spark.sql.DataFrame, colName: String,
      expectedItems: Long, numBits: Long): Array[Byte] =
    df.select(bloomAgg(org.apache.spark.sql.functions.col(colName),
      expectedItems, numBits).as("bf")).head.getAs[Array[Byte]](0)
}
