package graft.functions

/** One string collation for every trainer decision an oracle replays.
  *
  * Spark's `orderBy` on StringType compares UTF8String BYTES and DuckDB's
  * default collation is binary — both are Unicode CODE-POINT order. Java's
  * `String.compareTo` orders by UTF-16 code UNIT instead, which disagrees
  * for count ties between a BMP piece in U+E000..U+FFFF and a
  * supplementary-plane piece (surrogates sort below U+E000 in UTF-16 but
  * supplementary code points sort above U+FFFF in UTF-8). Any trainer that
  * argmaxes in Spark on one path and in Scala on another must use THIS
  * order on the Scala side, or tied counts can pick different symbols per
  * engine ([[Bpe]] serial-vs-distributed parity, [[Unigram]] seed-vs-prune
  * consistency and the DuckDB replay oracles).
  */
object Collation {

  /** Total order on strings by Unicode code point — equivalent to
    * comparing their UTF-8 byte sequences, without allocating the bytes. */
  val utf8Order: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      var i = 0
      var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }

  /** (count DESC, string ASC-by-utf8) — the shared argmax order of the
    * tokenizer trainers (highest count wins, code-point-smallest string
    * breaks ties), as an Ordering on (string, count) pairs. */
  val byCountDescThenUtf8: Ordering[(String, Long)] =
    Ordering.by[(String, Long), Long](-_._2).orElse(
      Ordering.by[(String, Long), String](_._1)(utf8Order))
}
