package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization" —
  * the algorithm behind SentencePiece's default model, what Llama/T5
  * vocabularies are actually trained with). Completes the tokenizer
  * family next to [[Bpe]]: BPE grows a vocabulary bottom-up by merge
  * frequency; unigram starts from a large substring seed and keeps the
  * pieces a probabilistic model finds useful.
  *
  * Faithful-but-deterministic variant:
  *  - SentencePiece's `▁` (U+2581) word-boundary convention: every
  *    word is prefixed with `▁` before segmentation, so decode is
  *    `concat → replace(▁, space) → trim` — lossless like Bpe's
  *    `</w>` without a sentinel suffix in every word.
  *  - Hard-EM (Viterbi-EM) instead of full forward-backward: the
  *    E-step assigns each word its single best segmentation. Counts
  *    stay integers, the likelihood still increases monotonically on
  *    the training words, and every decision is replayable.
  *  - QUANTIZED log-probs: piece scores are `floor(ln(c/T)·1e6)` in
  *    BIGINT micro-nats (the t26 pico-nat discipline). Viterbi sums
  *    integers, so the DP argmax is EXACT — no float near-tie can flip
  *    a segmentation between engines, and ties break structurally
  *    (shortest last piece wins: transitions scan piece length
  *    ascending with a strict `>`).
  *
  * Distribution shape (the [[Bpe.trainDistributed]] pattern): the
  * corpus is read ONCE by the word-frequency aggregate; the substring
  * seed and each E-step are vocabulary-sized aggregates (map-side
  * combined); the model that crosses to the driver is the piece table,
  * O(seedSize) — never corpus-sized. The Viterbi map broadcasts the
  * piece table to executors like Bpe's merge-rank map.
  */
object Unigram {

  /** SentencePiece's word-boundary marker. */
  val Boundary = "▁"

  /** Unknown-character score in micro-nats: any single code point not
    * in the vocabulary segments as itself at this fixed penalty (~20
    * nats below anything real — always usable, never preferred). */
  val UnkScore: Long = -20000000L

  /** Trained model: piece → quantized log-prob (micro-nats, ≤ 0), plus
    * the piece-length bound it was trained with (Viterbi must scan the
    * same transition lengths at encode time). */
  final case class Model(logq: Map[String, Long],
      maxPieceLen: Int) extends Serializable

  /** Split into code points (NOT Java chars — surrogate pairs stay
    * whole, same rationale as [[Bpe.baseSymbols]]). */
  private[graft] def codePoints(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** All substrings of 1..maxLen code points, every occurrence counted
    * (overlapping included) — the seed-frequency unit. */
  private[graft] def substrings(word: String, maxLen: Int): Seq[String] = {
    val cps = codePoints(word)
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < cps.length) {
      var l = 1
      while (l <= maxLen && i + l <= cps.length) {
        out += cps.slice(i, i + l).mkString
        l += 1
      }
      i += 1
    }
    out.result()
  }

  /** Viterbi segmentation of one word under quantized piece scores.
    * dp(i) = best micro-nat sum for the first i code points; transition
    * lengths scan ASCENDING with strict `>`, so among equal-score paths
    * the SHORTEST last piece wins — a structural, engine-free
    * tie-break. Single code points missing from the vocabulary fall
    * back to [[UnkScore]], so segmentation never fails.
    * Returns (pieces, total micro-nat score). */
  private[graft] def viterbi(word: String, logq: Map[String, Long],
      maxLen: Int): (Vector[String], Long) = {
    val cps = codePoints(word)
    val n = cps.length
    if (n == 0) return (Vector.empty, 0L)
    val dp = Array.fill(n + 1)(Long.MinValue)
    val back = new Array[Int](n + 1)
    dp(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        if (dp(i - l) != Long.MinValue) {
          val piece = cps.slice(i - l, i).mkString
          val s = logq.get(piece) match {
            case Some(q) => q
            case None => if (l == 1) UnkScore else Long.MinValue
          }
          if (s != Long.MinValue && dp(i - l) + s > dp(i)) {
            dp(i) = dp(i - l) + s
            back(i) = l
          }
        }
        l += 1
      }
      i += 1
    }
    val pieces = Vector.newBuilder[String]
    var rev = List.empty[String]
    var pos = n
    while (pos > 0) {
      val l = back(pos)
      rev = cps.slice(pos - l, pos).mkString :: rev
      pos -= l
    }
    rev.foreach(pieces += _)
    (pieces.result(), dp(n))
  }

  /** Best Viterbi SCORE of a word with one piece banned from the
    * vocabulary — the per-piece likelihood-loss probe of the
    * SentencePiece prune step (re-segment without the piece; single
    * code points still fall back to [[UnkScore]], so a path always
    * exists). Score-only: the loss aggregate never needs the path. */
  private[graft] def viterbiBanned(word: String, logq: Map[String, Long],
      maxLen: Int, banned: String): Long = {
    val cps = codePoints(word)
    val n = cps.length
    if (n == 0) return 0L
    val dp = Array.fill(n + 1)(Long.MinValue)
    dp(0) = 0L
    var i = 1
    while (i <= n) {
      var l = 1
      val lMax = math.min(maxLen, i)
      while (l <= lMax) {
        if (dp(i - l) != Long.MinValue) {
          val piece = cps.slice(i - l, i).mkString
          val s =
            if (piece == banned) Long.MinValue
            else logq.get(piece) match {
              case Some(q) => q
              case None => if (l == 1) UnkScore else Long.MinValue
            }
          if (s != Long.MinValue && dp(i - l) + s > dp(i)) dp(i) = dp(i - l) + s
        }
        l += 1
      }
      i += 1
    }
    dp(n)
  }

  /** Quantized log-prob table from integer piece counts: micro-nats,
    * floor — the ONE float touch in the whole trainer, immediately
    * frozen to BIGINT so every downstream decision is integer-exact. */
  private[graft] def quantize(counts: Map[String, Long]): Map[String, Long] = {
    val total = counts.valuesIterator.sum.toDouble
    counts.map { case (p, c) =>
      p -> math.floor(math.log(c.toDouble / total) * 1e6).toLong
    }
  }

  /** Train a unigram model over the corpus' word-frequency table.
    *
    * 1. ONE corpus pass: word counts (words pre-marked with [[Boundary]]).
    * 2. Seed: every 1..maxPieceLen-cp substring weighted by word count,
    *    top `seedSize` by (count DESC, piece ASC) ∪ ALL single code
    *    points (coverage: segmentation can never fail on training text).
    * 3. `emIters` hard-EM rounds: broadcast the quantized model,
    *    Viterbi-segment the word table (narrow map), aggregate weighted
    *    piece counts, re-quantize. Pieces the E-step never uses drop;
    *    single code points are floored at count 1 (coverage again).
    * 4. Prune to `vocabSize`: by (count DESC, piece ASC) — or, with
    *    `pruneByLoss`, by LIKELIHOOD LOSS, SentencePiece's actual prune
    *    criterion: one more vocabulary-sized aggregate round scores
    *    every multi-cp piece by Σ c·(viterbi(w) − viterbiWithout(w, p))
    *    over the words whose best path uses it — how many micro-nats the
    *    corpus loses if the piece disappears — and keeps the top
    *    `vocabSize` by (loss DESC, piece ASC). A frequent-but-redundant
    *    piece (its words re-segment almost as well without it) ranks
    *    low here but high by count; loss-pruning keeps the pieces the
    *    model would miss. Either way single cps stay (coverage) and the
    *    kept mass is re-quantized.
    *
    * Every selection is a total order on integers and strings; the only
    * float is the frozen micro-nat quantization — the model is a pure
    * function of the word counts. Losses are integer Viterbi sums, so
    * the loss regime replays engine-free exactly like the count regime. */
  def train(df: DataFrame, textCol: String, vocabSize: Int,
      maxPieceLen: Int = 4, emIters: Int = 2,
      seedSize: Int = 20000, pruneByLoss: Boolean = false): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    require(vocabSize > 0 && seedSize >= vocabSize,
      s"need seedSize >= vocabSize > 0, got $seedSize/$vocabSize")

    val words = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(concat(lit(Boundary), col("w")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .localCheckpoint()

    // --- seed: substring frequencies, vocabulary-sized aggregate ------
    val maxL = maxPieceLen
    val subCounts = words.flatMap { case (w, c) =>
        substrings(w, maxL).map(s => (s, c))
      }.toDF("p", "c")
      .groupBy(col("p")).agg(sum(col("c")).as("n"))
      .as[(String, Long)]
      .localCheckpoint()
    val singles = subCounts.filter(r => codePoints(r._1).length == 1)
      .collect().toMap
    val top = subCounts
      .orderBy(col("n").desc, col("p")).limit(seedSize)
      .collect().toMap
    var counts: Map[String, Long] = top ++ singles

    // --- hard-EM rounds -----------------------------------------------
    var it = 0
    while (it < emIters) {
      val model = quantize(counts)
      val bc = spark.sparkContext.broadcast(model)
      val used = words.flatMap { case (w, c) =>
          viterbi(w, bc.value, maxL)._1.map(p => (p, c))
        }.toDF("p", "c")
        .groupBy(col("p")).agg(sum(col("c")).as("n"))
        .as[(String, Long)].collect().toMap
      // coverage floor: single cps stay alive even when unused this round
      counts = used ++ singles.keysIterator
        .filterNot(used.contains).map(_ -> 1L).toMap
      bc.destroy()
      it += 1
    }

    // --- prune to the final vocabulary ---------------------------------
    // Same collation as the Spark-side seed top-K (orderBy = UTF8String
    // byte order): String.compareTo would disagree on count ties between
    // U+E000..U+FFFF and supplementary-plane pieces, letting the prune
    // diverge from the seed selection and the binary-collated oracle.
    val singleSet = singles.keySet
    // the count regime's budget is spent over ALL candidates, so some of
    // its vocabSize slots go to single-cp pieces that coverage would keep
    // anyway; the loss regime ranks only multi-cp pieces, so it must take
    // vocabSize MINUS those single-occupied slots or its effective
    // vocabulary is systematically larger and the t35 loss-vs-count
    // comparison stops isolating the prune criterion.
    val countKept: Map[String, Long] =
      counts.toSeq.sorted(Collation.byCountDescThenUtf8)
        .take(vocabSize).toMap
    val kept: Map[String, Long] =
      if (!pruneByLoss) countKept
      else {
        // per-piece likelihood loss as ONE more vocabulary-sized
        // aggregate (map-side combined): each word re-Viterbis once per
        // DISTINCT multi-cp piece on its best path — a few score-only
        // DPs per word, never corpus-sized driver state. Single cps are
        // un-droppable (coverage), so they skip the ranking.
        val model = quantize(counts)
        val bcL = spark.sparkContext.broadcast(model)
        val maxLenL = maxL
        val losses = words.flatMap { case (w, c) =>
            val (pieces, s0) = viterbi(w, bcL.value, maxLenL)
            pieces.distinct.iterator
              .filter(p => codePoints(p).length > 1)
              .map(p => (p, c * (s0 - viterbiBanned(w, bcL.value, maxLenL, p))))
          }.toDF("p", "loss")
          .groupBy(col("p")).agg(sum(col("loss")).as("l"))
          .as[(String, Long)].collect().toMap
        bcL.destroy()
        val multiBudget =
          vocabSize - countKept.keysIterator.count(singleSet.contains)
        losses.toSeq.sorted(Collation.byCountDescThenUtf8)
          .take(math.max(0, multiBudget))
          .map { case (p, _) => p -> counts(p) }.toMap
      }
    val withCoverage = kept ++ singleSet.iterator
      .filterNot(kept.contains).map(p => p -> counts(p)).toMap
    Model(quantize(withCoverage), maxPieceLen)
  }

  /** Subword tokens (array<string>) for a text column — Viterbi per
    * word under the broadcast model, per-task word memo ([[TaskMemo]] —
    * Zipf makes repeats ~free), the [[Bpe.encode]] UDF shape. */
  def encode(model: Model)(text: Column): Column = {
    val logq = model.logq
    val maxPieceLen = model.maxPieceLen
    val memo = new TaskMemo[Vector[String]]
    val f = udf { (s: String) =>
      if (s == null) Seq.empty[String]
      else s.split(" ").iterator.filter(_.nonEmpty).flatMap { w =>
        memo.get(w, x => viterbi(Boundary + x, logq, maxPieceLen)._1)
      }.toSeq
    }
    f(text)
  }

  /** Inverse of [[encode]] up to whitespace normalization: pieces
    * concatenate to the `▁`-marked word sequence; boundary markers turn
    * back into spaces. Pure column functions, codegen'd.
    * Same in-content-sentinel caveat as [[Bpe.decode]]. */
  def decode(tokens: Column): Column =
    ltrim(replace(concat_ws("", tokens), lit(Boundary), lit(" ")))

  /** Allocation-free token count (the packing/budget number): sums
    * memoized per-word Viterbi piece counts without materializing
    * arrays — parity with `size(encode(...))` is gate-enforced. */
  def tokenCount(model: Model)(text: Column): Column = {
    val logq = model.logq
    val maxPieceLen = model.maxPieceLen
    val memo = new TaskMemo[Integer]
    val f = udf { (s: String) =>
      if (s == null) 0
      else {
        var n = 0
        s.split(" ").foreach { w =>
          if (w.nonEmpty)
            n += memo.get(w,
              x => Integer.valueOf(viterbi(Boundary + x, logq, maxPieceLen)._1.length))
        }
        n
      }
    }
    f(text)
  }

  /** Weighted total Viterbi score of a word table under a model — the
    * in-plan likelihood probe the t35 contract uses to assert hard-EM
    * improved the model it trained. */
  def corpusScore(df: DataFrame, textCol: String, model: Model): Long = {
    val maxPieceLen = model.maxPieceLen
    val spark = df.sparkSession
    import spark.implicits._
    val logq = model.logq
    df.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(concat(lit(Boundary), col("w")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .map { case (w, c) => viterbi(w, logq, maxPieceLen)._2 * c }
      .reduce(_ + _)
  }
}
