package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM training data: assign documents to
  * fixed-capacity context windows ("bins") by GLOBAL prefix sum of token
  * counts — greedy contiguous packing in a deterministic document order.
  *
  * The distributed prefix sum is the textbook two-pass shape:
  *   1. range-repartition + sort → a total order across partitions;
  *   2. one tiny job collects per-partition token totals (one long per
  *      partition — driver state is O(partitions), never O(rows));
  *   3. a narrow per-partition pass assigns each doc its global start
  *      offset from the broadcast partition offsets.
  *
  * Bin assignment depends only on the global order, not the
  * partitioning, so results are identical at any partition count. This
  * is one of the rare genuinely-imperative per-partition computations
  * where `mapPartitions` over RDD rows is the right tier (a running
  * scalar keyed by partition index has no Catalyst expression form).
  */
object Packing {

  /** @return (idCol, tokCol, bin) — one row per doc, packed in ascending
    *         `idCol` order; a doc goes to the bin where its global token
    *         offset starts (`offset / capacity`). Join back on idCol for
    *         the remaining columns. */
  def packByOrder(df: DataFrame, idCol: String, tokCol: String,
      capacity: Long): DataFrame = {
    require(capacity > 0)
    val spark = df.sparkSession
    // persisted so the sort isn't recomputed between the totals job and
    // the offsets pass (freed by LRU once downstream consumes it)
    val sorted = df
      .select(col(idCol).cast("long").as("__id"), col(tokCol).cast("long").as("__tok"))
      .repartitionByRange(col("__id"))
      .sortWithinPartitions(col("__id"))
      .persist()
    // pass 1: per-partition token totals (tiny: one long per partition)
    val partSums = sorted.rdd
      .mapPartitionsWithIndex { case (pid, it) =>
        var s = 0L; it.foreach(r => s += r.getLong(1)); Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // offsets(pid) = tokens before pid
    val bOffsets = spark.sparkContext.broadcast(offsets)
    // pass 2: narrow — running offset within each partition
    val packed = sorted.rdd.mapPartitionsWithIndex { case (pid, it) =>
      var running = bOffsets.value(pid)
      it.map { r =>
        val start = running
        running += r.getLong(1)
        Row(r.getLong(0), r.getLong(1), start / capacity)
      }
    }
    spark.createDataFrame(packed, StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField(tokCol, LongType, nullable = false),
      StructField("bin", LongType, nullable = false))))
  }
}
