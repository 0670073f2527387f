package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WordPiece tokenizer (Schuster & Nakajima 2012; Wu et al. 2016 — the
  * BERT-family subword tokenizer), completing the subword triple next to
  * BPE ([[Bpe]], merge-rank greedy) and Unigram-LM ([[Unigram]],
  * Viterbi): WordPiece ENCODES by greedy longest-match-first over a
  * vocabulary (continuation pieces carry the `##` prefix; a word with no
  * viable segmentation is one `[UNK]` token) and TRAINS like BPE except
  * the merge argmax maximizes the likelihood-ratio score
  * `count(ab) / (count(a) · count(b))` instead of the raw pair count —
  * the published criterion (HuggingFace tokenizers' WordPiece trainer
  * documents exactly this objective).
  *
  * Distribution shape: identical to [[Bpe]] — the corpus-sized work is
  * ONE word-frequency aggregate; the serial trainer then runs
  * driver-side over the bounded word table, and [[trainDistributed]]
  * keeps the word table on the executors with two vocabulary-sized
  * aggregates (pair counts + symbol counts) per round, only the winning
  * pair returning to the driver.
  *
  * Determinism (the t12/t35 discipline): the score is QUANTIZED to an
  * integer — `(count(ab) · 10¹²) / (count(a) · count(b))` in exact
  * BigInt arithmetic — so every argmax is an integer comparison a SQL
  * replay reproduces bit-for-bit (`HUGEINT` multiply + floor-divide on
  * positives truncates exactly like BigInt), and ties break
  * lexicographically under ONE collation ([[Collation.utf8Order]] —
  * Spark's orderBy and DuckDB's binary VARCHAR order, the round-11
  * lesson baked in from day one). Since every occurrence of pair (a,b)
  * is also an occurrence of a and of b, `count(a)·count(b) ≥ count(ab)²`
  * and the quantized score is ≤ 10¹²/count(ab) — Long-safe at any
  * corpus size.
  */
object WordPiece {

  val Unk = "[UNK]"
  val ContPrefix = "##"
  private[graft] val ScoreScale = BigInt(1000000000000L) // 10^12

  /** Learned model: the greedy encoder needs only the VOCABULARY (unlike
    * BPE's ranked merges — match order is longest-first, not rank);
    * the merge list is kept for parity specs and replay oracles. */
  final case class Model(vocab: Set[String], merges: Seq[(String, String)])
      extends Serializable

  /** Split a word into base symbols: first CODE POINT plain, every
    * following code point `##`-prefixed (the WordPiece convention).
    * Code points, not Java chars — the [[Bpe.baseSymbols]] surrogate
    * rationale. */
  private[graft] def baseSymbols(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val s = new String(Character.toChars(cp))
      out += (if (i == 0) s else ContPrefix + s)
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** One left-to-right greedy application of merge (a,b) → `merged`
    * ([[Bpe.mergePair]]'s no-overlap scan with WordPiece's combine:
    * the merged symbol keeps a's continuation status and drops b's
    * `##`). */
  private[graft] def mergeWp(syms0: Vector[String], a: String, b: String,
      merged: String): Vector[String] = {
    var out = syms0
    var i = 0
    while (i < out.length - 1) {
      if (out(i) == a && out(i + 1) == b)
        out = (out.take(i) :+ merged) ++ out.drop(i + 2)
      else i += 1
    }
    out
  }

  private[graft] def mergedSymbol(a: String, b: String): String =
    a + (if (b.startsWith(ContPrefix)) b.substring(ContPrefix.length) else b)

  /** Train `nMerges` likelihood-scored merges on the corpus'
    * word-frequency table (the [[Bpe.train]] shape and `maxWordRows`
    * driver bound). The vocabulary is the base alphabet of the word
    * table plus one token per merge. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      maxWordRows: Int = 100000): Model = {
    val words = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWordRows)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromWordCounts(words, nMerges)
  }

  /** Driver-side merge loop over a word-count table (exposed for specs
    * and the distributed-parity contract). */
  private[graft] def trainFromWordCounts(words: Array[(String, Long)],
      nMerges: Int): Model = {
    var current: Array[(Vector[String], Long)] =
      words.map { case (w, c) => (baseSymbols(w), c) }
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    current.foreach(_._1.foreach(vocab += _))
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    while (m < nMerges) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      val symCounts = scala.collection.mutable.HashMap.empty[String, Long]
      current.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          symCounts.update(syms(i), symCounts.getOrElse(syms(i), 0L) + c)
          if (i < syms.length - 1) {
            val p = (syms(i), syms(i + 1))
            pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          }
          i += 1
        }
      }
      if (pairCounts.isEmpty) m = nMerges
      else {
        val best = pairCounts.iterator.map { case (p, n) =>
          val q = (BigInt(n) * ScoreScale /
            (BigInt(symCounts(p._1)) * BigInt(symCounts(p._2)))).toLong
          (p, q)
        }.toSeq.min(
          Ordering.by[((String, String), Long), Long](-_._2).orElse(
            Ordering.by[((String, String), Long), String](_._1._1)(Collation.utf8Order)).orElse(
            Ordering.by[((String, String), Long), String](_._1._2)(Collation.utf8Order)))._1
        merges += best
        val merged = mergedSymbol(best._1, best._2)
        vocab += merged
        current = current.map { case (syms, c) =>
          (mergeWp(syms, best._1, best._2, merged), c)
        }
        m += 1
      }
    }
    Model(vocab.toSet, merges.result())
  }

  /** Distributed WordPiece trainer — [[train]]'s 100 TB regime
    * ([[Bpe.trainDistributed]]'s loop with the likelihood argmax): the
    * word table never leaves the executors; each round runs TWO
    * vocabulary-sized aggregates (adjacent-pair counts and symbol
    * counts), joins them, computes the quantized score in exact BigInt
    * on the executors, and only the (score DESC, a, b) argmax row
    * returns to the driver. Identical to [[train]] whenever the
    * vocabulary fits the serial cap (spec-pinned). */
  def trainDistributed(df: DataFrame, textCol: String, nMerges: Int,
      checkpointEvery: Int = 8): Model = {
    require(checkpointEvery >= 1, s"checkpointEvery=$checkpointEvery < 1")
    val spark = df.sparkSession
    import spark.implicits._
    var current = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .map { case (w, c) => (baseSymbols(w), c) }
      .localCheckpoint()
    // census-driven parallelism (the Bpe.trainDistributed discipline):
    // the word table is orders smaller than the corpus — don't pay 32
    // tasks of scheduling per round for kilobytes of work
    val vocabRows = current.count()
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      (vocabRows + 199999L) / 200000L)).toInt
    if (parts < current.rdd.getNumPartitions)
      current = current.coalesce(parts)
    val vocab = scala.collection.mutable.LinkedHashSet.empty[String]
    current.flatMap(_._1).distinct().collect().sorted(Collation.utf8Order)
      .foreach(vocab += _)
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val pairs = current.flatMap { case (syms, c) =>
          (0 until syms.length - 1).iterator
            .map(i => (syms(i), syms(i + 1), c))
        }.toDF("a", "b", "c")
        .groupBy(col("a"), col("b")).agg(sum(col("c")).as("n"))
      val syms = current.flatMap { case (ss, c) => ss.iterator.map((_, c)) }
        .toDF("s", "c")
        .groupBy(col("s")).agg(sum(col("c")).as("cnt"))
      val top = pairs
        .join(syms.select(col("s").as("a"), col("cnt").as("ca")), Seq("a"))
        .join(syms.select(col("s").as("b"), col("cnt").as("cb")), Seq("b"))
        .select(col("a"), col("b"), col("n"), col("ca"), col("cb"))
        .as[(String, String, Long, Long, Long)]
        .map { case (a, b, n, ca, cb) =>
          (a, b, (BigInt(n) * ScoreScale / (BigInt(ca) * BigInt(cb))).toLong)
        }
        .toDF("a", "b", "q")
        .orderBy(col("q").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val merged = mergedSymbol(a, b)
        vocab += merged
        val mapped = current.map { case (ss, c) =>
          (mergeWp(ss, a, b, merged), c)
        }
        m += 1
        current = if (m % checkpointEvery == 0) mapped.localCheckpoint()
                  else mapped
      }
    }
    Model(vocab.toSet, merges.result())
  }

  /** Greedy longest-match-first segmentation of one word (the published
    * WordPiece/BERT algorithm): at each position take the LONGEST vocab
    * piece (`##`-prefixed after the first); if no piece matches at some
    * position the whole word is `[UNK]`. Code-point boundaries —
    * a match never splits a surrogate pair. */
  private[graft] def encodeWord(w: String, vocab: Set[String])
      : Vector[String] = {
    // code-point boundary offsets: bounds(k) = char index of cp k
    val bounds = {
      val b = Vector.newBuilder[Int]
      var i = 0
      while (i < w.length) { b += i; i += Character.charCount(w.codePointAt(i)) }
      (b += w.length).result()
    }
    val n = bounds.length - 1
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < n) {
      var j = n
      var hit: String = null
      while (hit == null && j > i) {
        val sub = w.substring(bounds(i), bounds(j))
        val piece = if (i == 0) sub else ContPrefix + sub
        // a word whose literal text starts with "##" must NOT match a
        // CONTINUATION piece at position 0 (plain and ##-pieces share
        // one vocabulary namespace — the vocab.txt reality): matching
        // one would make decode() glue the word onto its predecessor,
        // breaking decode∘encode. Skipping it keeps the round trip
        // lossless for any corpus whose TRAINING words don't start with
        // "##" (then no plain piece does either); such a word segments
        // through its "#" pieces or falls back to [UNK].
        if ((i > 0 || !sub.startsWith(ContPrefix)) && vocab.contains(piece))
          hit = piece
        else j -= 1
      }
      if (hit == null) return Vector(Unk)
      out += hit
      i = j
    }
    out.result()
  }

  /** Column of WordPiece tokens (array<string>) under a trained model.
    * The vocab ships once per executor via the UDF closure; the
    * per-TASK [[TaskMemo]] amortizes repeated words across the task's
    * documents (the measured 29× unigram lesson). */
  def encode(model: Model)(text: Column): Column = {
    val vocab = model.vocab
    val memo = new TaskMemo[Vector[String]]
    val f = udf { (s: String) =>
      if (s == null) Seq.empty[String]
      else s.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
        memo.get(w, x => encodeWord(x, vocab))
      }.toSeq
    }
    f(text)
  }

  /** Inverse of [[encode]] up to whitespace normalization for words that
    * segmented (a `##` piece glues to its predecessor; a plain piece
    * starts a new word). `[UNK]` words are lossy by construction —
    * the t37 contract corpus is UNK-free (its alphabet trains the
    * model), and the UNK path is spec-pinned instead. Pure column
    * functions — codegen'd, no UDF.
    *
    * CAVEAT (the [[Bpe.decode]] `</w>` analog): the `##` marker is
    * in-band, so a PLAIN piece whose text itself starts with "##" (only
    * possible when a TRAINING word starts with "##") is
    * indistinguishable from a continuation here. [[encodeWord]]'s
    * position-0 guard keeps decode∘encode lossless for every input as
    * long as training words don't start with the literal marker;
    * retrain with a private-use-codepoint prefix for corpora where that
    * collision is live. */
  def decode(tokens: Column): Column =
    ltrim(concat_ws("", transform(tokens, t =>
      when(t.startsWith(ContPrefix), substring(t, 3, 1 << 30))
        .otherwise(concat(lit(" "), t)))))

  /** Serialize the model in the BERT `vocab.txt` convention — one piece
    * per line, line number = token id, `##` continuations inline (the
    * format every BERT-family checkpoint ships and every tokenizer
    * library loads). Line order is DETERMINISTIC so two identical
    * trainings produce byte-identical artifacts: `[UNK]` first, then
    * the base alphabet in [[Collation.utf8Order]], then the merged
    * tokens in TRAINING order (the id-assignment convention WordPiece
    * trainers use — later merges get higher ids). */
  def saveVocab(model: Model, path: java.nio.file.Path): Unit = {
    val base = (model.vocab -- model.merges.map(m =>
      mergedSymbol(m._1, m._2)).toSet - Unk).toSeq.sorted(Collation.utf8Order)
    // distinct: two different merge pairs can produce the same surface
    // string (("a","##bc") and ("ab","##c") both yield "abc"); the
    // vocabulary stores it once, so the artifact must too — duplicate
    // lines would shift every later token id for an external loader
    val lines = ((Unk +: base) ++ model.merges.map(m =>
      mergedSymbol(m._1, m._2))).distinct
    java.nio.file.Files.write(path,
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  /** Load a `vocab.txt` artifact (ours or any BERT checkpoint's) back
    * into a [[Model]]. The greedy encoder needs only the vocabulary, so
    * an imported model encodes identically to the trained one
    * (spec-pinned round trip); `merges` is empty — training provenance
    * does not survive the public format, by its design. The `[UNK]`
    * line is the encoder's whole-word fallback SENTINEL, not a
    * matchable piece — it is dropped on load so a word containing the
    * literal text "[UNK]" segments the same under a trained and an
    * imported model. */
  def loadVocab(path: java.nio.file.Path): Model = {
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files.readAllLines(path,
      java.nio.charset.StandardCharsets.UTF_8).asScala
    Model(lines.iterator.filter(l => l.nonEmpty && l != Unk).toSet,
      Seq.empty)
  }

  /** Learned-vocabulary token count — the allocation-free twin of
    * `size(encode(...))` (the [[Bpe.tokenCount]] shape). */
  def tokenCount(model: Model)(text: Column): Column = {
    val vocab = model.vocab
    val memo = new TaskMemo[Integer]
    val f = udf { (s: String) =>
      if (s == null) 0
      else {
        var n = 0
        s.split(" ").foreach { w =>
          if (w.nonEmpty)
            n += memo.get(w, x => Integer.valueOf(encodeWord(x, vocab).length))
        }
        n
      }
    }
    f(text)
  }
}
