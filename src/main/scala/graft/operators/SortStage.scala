package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Helper for the global-sort double-execution trap.
  *
  * `df.orderBy(k)` plans a range exchange, and RangePartitioner picks its
  * bounds by SAMPLING the child plan — a full extra execution of
  * everything below the sort. When the child is a narrow chain from the
  * scan (per-row decode / regex battery / feature extraction), the whole
  * expensive pipeline runs TWICE per action (measured: t31's HTML
  * extraction query dropped 1.16 s → 0.63 s at sf0.1 once staged; at
  * 100 TB the sampling pass would re-decode the entire corpus).
  *
  * [[orderByStaged]] inserts a hash exchange on the sort keys under the
  * sort, so the narrow chain materializes ONCE as a shuffle stage and the
  * range-bounds sampling re-reads shuffle output instead of re-running
  * the chain. Costs one extra exchange of the RESULT rows — metadata-
  * sized for every caller (ids, counts, digests), never the corpus — and
  * stays scale-adaptive (no partition count pinned; AQE coalesces).
  *
  * Only worth it when the work below the sort is expensive relative to
  * one exchange of the output; trivially-computed outputs should keep the
  * plain `orderBy`. Row-identical by construction: a hash repartition
  * below a total-order sort cannot change the sorted result.
  */
object SortStage {
  def orderByStaged(df: DataFrame, keys: Column*): DataFrame =
    df.repartition(keys: _*).orderBy(keys: _*)

  /** As [[orderByStaged]], for sorts whose keys carry direction markers
    * (`desc`) that `repartition` cannot take: stage on `hashKeys` (any
    * deterministic plain columns — the staging exchange is only a
    * materialization boundary, its key never affects the sorted result),
    * sort by `sortKeys`. */
  def orderByStagedOn(df: DataFrame, hashKeys: Seq[Column],
      sortKeys: Seq[Column]): DataFrame =
    df.repartition(hashKeys: _*).orderBy(sortKeys: _*)
}
