package graft.functions

/** Per-TASK word→result memo for expensive word-level UDFs (the
  * tokenizer encode/count paths). A per-DOCUMENT memo recomputes every
  * word's DP once per document; Zipf means a task's documents share most
  * of their vocabulary, so one memo per deserialized task closure makes
  * repeated words ~one map probe (measured on the unigram Viterbi UDF:
  * per-task vs per-doc took the sf10 encode pass from 43 s to 1.5 s).
  *
  * `@transient lazy val` materializes one map per deserialized closure —
  * Spark deserializes a fresh closure per task, so the map is
  * thread-confined by construction (no locking on the hot path).
  *
  * The cap bounds memory on adversarial vocabularies. Eviction is true
  * LRU (access-ordered LinkedHashMap, O(1) per probe) rather than a
  * wholesale clear: a vocabulary slightly over the cap would thrash a
  * clear-when-full policy back to cold every ~cap words, while LRU only
  * ever drops the coldest entry.
  */
private[functions] final class TaskMemo[V](cap: Int = 131072)
    extends Serializable {
  require(cap > 0, s"memo cap=$cap must be positive")

  @transient private lazy val m =
    new java.util.LinkedHashMap[String, V](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, V]): Boolean = size() > cap
    }

  def get(w: String, compute: String => V): V = {
    val hit = m.get(w)
    if (hit != null) hit
    else {
      val v = compute(w)
      m.put(w, v)
      v
    }
  }
}
