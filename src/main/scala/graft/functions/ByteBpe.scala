package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-level byte-pair-encoding tokenizer — the GPT-2/tiktoken shape
  * (Radford et al. 2019 `bytes_to_unicode`), the fourth trained
  * tokenizer family next to [[Bpe]] (char BPE), [[WordPiece]] and
  * [[Unigram]].
  *
  * What byte-level buys over the other three is STRUCTURAL: the base
  * alphabet is all 256 bytes, so every input is encodable (no `[UNK]`
  * path at all) and there is no in-band sentinel to collide with —
  * [[Bpe.EndOfWord]]'s `</w>`, [[WordPiece]]'s `##` and vocab.txt's
  * `[UNK]` each carry a documented in-content-collision caveat, while
  * here the byte→printable-char map is a BIJECTION between byte
  * sequences and symbol strings: an input that literally contains `Ġ`
  * (the mapped space glyph) encodes through the two UTF-8 BYTES of
  * U+0120, never through the single mapped symbol, so decode∘encode is
  * the identity on ARBITRARY text — including repeated/leading spaces,
  * which the pre-tokenizer keeps as data (a space attaches to the word
  * it precedes, GPT-2's `Ġword` convention) rather than normalizing
  * away.
  *
  * Distribution shape: identical to [[Bpe]] (whose merge kernels —
  * [[Bpe.mergePair]]/[[Bpe.applyMerges]] — this object reuses, so the
  * two families' merge semantics cannot drift): the corpus-sized work
  * is one pretoken-frequency aggregate; merge training runs over the
  * bounded word table (driver-side here, distributed in
  * [[trainDistributed]]); encode ships the rank map once per executor
  * and memoizes per task ([[TaskMemo]]).
  *
  * Determinism: argmax ties break (count DESC, a ASC, b ASC) under
  * [[Collation.utf8Order]] — one total order for the serial trainer,
  * the distributed trainer's `orderBy`, and the DuckDB oracle replay.
  */
object ByteBpe {

  /** GPT-2 printable ranges: bytes that map to themselves. */
  private def printable(b: Int): Boolean =
    (b >= 33 && b <= 126) || (b >= 161 && b <= 172) || (b >= 174 && b <= 255)

  /** byte → single-char symbol (the published `bytes_to_unicode`):
    * printable bytes keep their codepoint; the 68 others get
    * 256,257,… in increasing byte order. Max codepoint 323 — every
    * symbol is one BMP char. */
  val byteToChar: Array[String] = {
    var shift = 0
    Array.tabulate(256) { b =>
      if (printable(b)) String.valueOf(b.toChar)
      else { val s = String.valueOf((256 + shift).toChar); shift += 1; s }
    }
  }

  /** Inverse map, dense array over the ≤323 codepoint range; -1 = not a
    * mapped symbol char (impossible in well-formed tokens — [[decode]]
    * fails loud rather than guessing). */
  private val charToByte: Array[Int] = {
    val a = Array.fill(512)(-1)
    var b = 0
    while (b < 256) { a(byteToChar(b).charAt(0)) = b; b += 1 }
    a
  }

  /** Learned merge rules in application order, plus the pre-tokenizer
    * mode they were trained under (`"space"` or `"gpt2"` — encode and
    * tokenCount read it off the model, so a train/encode pretokenizer
    * mismatch is unrepresentable). `vocab` = 256 base symbols + one
    * token per merge (useful for closure checks; encode itself never
    * consults it — that is the no-UNK structure). */
  final case class Model(merges: Seq[(String, String)],
      pretok: String = PretokSpace) extends Serializable {
    require(Pretoks.contains(pretok),
      s"pretok must be one of $Pretoks, got '$pretok'")
    @transient lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    @transient lazy val vocab: Set[String] =
      byteToChar.toSet ++ merges.map { case (a, b) => a + b }
  }

  val PretokSpace = "space"
  val PretokGpt2 = "gpt2"
  private[graft] val Pretoks = Seq(PretokSpace, PretokGpt2)

  /** Default pre-tokenizer: split BEFORE every space, so each space
    * stays glued to the word it precedes (`"a b"` → `["a", " b"]`;
    * `"a  b"` → `["a", " ", " b"]`). Concatenating the pretokens
    * reproduces the input exactly — spaces are data, not separators.
    * The zero-width split pattern is shared verbatim with the
    * column-side `split` in the trainers. */
  private[graft] val PretokPattern = "(?= )"
  private val PretokRe = java.util.regex.Pattern.compile(PretokPattern)

  /** The published GPT-2 pre-tokenization pattern (Radford et al. 2019
    * encoder.py; the `pretok = "gpt2"` opt-in mode): contraction
    * suffixes, then optional-leading-space letter / digit /
    * punctuation RUNS, then whitespace fallbacks — `\s+(?!\S)` peels
    * interior whitespace runs so their LAST char stays glued to the
    * following word. Every match is kept (spaces are data), so
    * concatenating pretokens still reproduces the input exactly and
    * decode∘encode stays the identity.
    *
    * Checkpoint parity: under this mode, encode of a [[loadMerges]]'d
    * GPT-2 `merges.txt` matches HF tokenizers' pretokenization on text
    * whose whitespace is ASCII (space/tab/newline/CR/FF) — which is
    * where the space-only default diverges on contractions ("don't"),
    * letter/digit boundaries ("abc123") and punctuation ("a,b"). The
    * one documented residual divergence: GPT-2/HF compile the pattern
    * with Unicode `\s`, while this engine keeps Java/RE2's default
    * ASCII `\s` so the DuckDB oracle replays the identical class — an
    * exotic Unicode space (U+00A0, U+2028…) therefore pretokenizes
    * into the punctuation-run branch here vs the whitespace branch in
    * HF. Byte-level encoding keeps round-trips exact either way. */
  private[graft] val Gpt2Pattern =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
  private val Gpt2Re = java.util.regex.Pattern.compile(Gpt2Pattern)

  private[graft] def pretokens(text: String): Array[String] =
    PretokRe.split(text).filter(_.nonEmpty)

  private[graft] def pretokens(text: String, pretok: String): Array[String] =
    pretok match {
      case PretokSpace => pretokens(text)
      case PretokGpt2 =>
        val m = Gpt2Re.matcher(text)
        val out = Array.newBuilder[String]
        while (m.find()) out += m.group()
        out.result()
    }

  /** The SAME pre-tokenization as a column expression — shared between
    * the trainers' corpus pass and the UDF paths so the two can never
    * drift (both run Java regex; the DuckDB oracles replay the same
    * pattern class under RE2). */
  private[graft] def pretokensCol(c: Column, pretok: String): Column =
    pretok match {
      case PretokSpace => split(c, PretokPattern)
      case PretokGpt2  => regexp_extract_all(c, lit(Gpt2Pattern), lit(0))
      case other => throw new IllegalArgumentException(
        s"pretok must be one of $Pretoks, got '$other'")
    }

  /** Base symbols: one mapped char per UTF-8 BYTE. No end-of-word
    * marker — word separation lives in the leading-space byte. */
  private[graft] def baseSymbols(w: String): Vector[String] = {
    val bytes = w.getBytes(UTF_8)
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < bytes.length) { out += byteToChar(bytes(i) & 0xff); i += 1 }
    out.result()
  }

  /** Train `nMerges` merges on the pretoken-frequency table (serial
    * driver loop — [[Bpe.train]]'s shape with byte symbolization; the
    * `maxWordRows` cap bounds driver state the same way). */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      maxWordRows: Int = 100000, pretok: String = PretokSpace): Model = {
    val words = df
      .select(explode(pretokensCol(col(textCol), pretok)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWordRows)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromWordCounts(words, nMerges, pretok)
  }

  /** Driver-side merge loop (exposed for specs) — [[Bpe]]'s argmax
    * total order, byte base symbols. */
  private[graft] def trainFromWordCounts(words: Array[(String, Long)],
      nMerges: Int, pretok: String = PretokSpace): Model = {
    var current: Array[(Vector[String], Long)] =
      words.map { case (w, c) => (baseSymbols(w), c) }
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    while (m < nMerges) {
      val pairCounts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      current.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          i += 1
        }
      }
      if (pairCounts.isEmpty) m = nMerges
      else {
        val best = pairCounts.toSeq.min(
          Ordering.by[((String, String), Long), Long](-_._2).orElse(
            Ordering.by[((String, String), Long), String](_._1._1)(Collation.utf8Order)).orElse(
            Ordering.by[((String, String), Long), String](_._1._2)(Collation.utf8Order)))._1
        merges += best
        current = current.map { case (syms, c) =>
          (Bpe.mergePair(syms, best._1, best._2), c)
        }
        m += 1
      }
    }
    Model(merges.result(), pretok)
  }

  /** Distributed trainer — [[Bpe.trainDistributed]]'s regime (word
    * table stays on executors, one vocabulary-sized pair-count argmax
    * per round, merge applied as a narrow map, lineage truncated every
    * `checkpointEvery` rounds) with byte symbolization and the
    * leading-space pre-tokenizer. Learns the identical model to
    * [[train]] whenever the vocabulary fits the serial cap
    * (t39-gated). */
  def trainDistributed(df: DataFrame, textCol: String,
      nMerges: Int, checkpointEvery: Int = 8,
      pretok: String = PretokSpace, maxWordRows: Long = 0L,
      serialUnder: Long = 100000L): Model = {
    require(checkpointEvery >= 1, s"checkpointEvery=$checkpointEvery < 1")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(pretokensCol(col(textCol), pretok)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
      .localCheckpoint()
    val vocabRows = words.count()
    // loud-failure guard for oracle-replayed gates: a DuckDB replay that
    // caps its pretoken table (LIMIT maxWordRows) is exact only while
    // the true vocabulary fits the cap — the trainer already counts the
    // vocabulary, so enforcing the bound costs nothing and a silent
    // replay drift at larger scale factors becomes an error instead
    require(maxWordRows <= 0L || vocabRows <= maxWordRows,
      s"pretoken vocabulary ($vocabRows rows) exceeds maxWordRows=" +
        s"$maxWordRows — the capped oracle replay would silently drift")
    // census-gated dispatch (see [[Bpe.trainDistributed]] — same
    // discipline, same bound): a driver-sized vocabulary finishes the
    // merge loop on the driver in milliseconds instead of one scheduled
    // argmax job per round; results are regime-identical (t39 pins
    // serial == distributed), 0 pins the distributed loop
    if (serialUnder > 0 && vocabRows <= serialUnder)
      return trainFromWordCounts(words.collect(), nMerges, pretok)
    var current = words
      .map { case (w, c) => (baseSymbols(w), c) }
      .localCheckpoint()
    val parts = math.max(1, math.min(
      spark.sparkContext.defaultParallelism.toLong,
      (vocabRows + 199999L) / 200000L)).toInt
    if (parts < current.rdd.getNumPartitions)
      current = current.coalesce(parts)
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = false
    while (m < nMerges && !done) {
      val top = current.flatMap { case (syms, c) =>
          (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), c))
        }.toDF("a", "b", "c")
        .groupBy(col("a"), col("b")).agg(sum(col("c")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val mapped = current.map { case (syms, c) =>
          (Bpe.mergePair(syms, a, b), c)
        }
        m += 1
        current = if (m % checkpointEvery == 0) mapped.localCheckpoint()
                  else mapped
      }
    }
    Model(merges.result(), pretok)
  }

  /** Column of byte-level tokens (array<string> over the mapped
    * alphabet). Rank map closure-ships once per executor; [[TaskMemo]]
    * amortizes repeated pretokens across a task's documents. */
  def encode(model: Model)(text: Column): Column = {
    val rank = model.rank
    val pretok = model.pretok
    val memo = new TaskMemo[Vector[String]]
    val f = udf { (s: String) =>
      if (s == null) Seq.empty[String]
      else pretokens(s, pretok).iterator.flatMap { w =>
        memo.get(w, x => Bpe.applyMerges(baseSymbols(x), rank))
      }.toSeq
    }
    f(text)
  }

  /** Exact inverse of [[encode]] on ANY input: concatenate tokens,
    * invert the byte map char-for-char, decode UTF-8. A UDF (the byte
    * reconstruction has no column-function form), but it only runs on
    * contract/round-trip paths — production counts use [[tokenCount]].
    * Fails loud on a char outside the mapped alphabet: such a token
    * cannot have come from [[encode]]. */
  def decode(tokens: Column): Column = {
    val f = udf { (toks: Seq[String]) =>
      if (toks == null) null
      else {
        var n = 0
        toks.foreach(t => n += t.length)
        val bytes = new Array[Byte](n)
        var o = 0
        toks.foreach { t =>
          var i = 0
          while (i < t.length) {
            val c = t.charAt(i).toInt
            val b = if (c < 512) charToByte(c) else -1
            if (b < 0) throw new IllegalArgumentException(
              s"not a byte-level BPE symbol char: U+${c.toHexString} in token '$t'")
            bytes(o) = b.toByte
            o += 1; i += 1
          }
        }
        new String(bytes, UTF_8)
      }
    }
    f(tokens)
  }

  /** Export the learned merges as a GPT-2 `merges.txt` artifact —
    * `#version: 0.2` header, then one `a b` line per merge in training
    * order (the format HF tokenizers / tiktoken-style loaders read).
    * The space separator is unambiguous BECAUSE of the byte map: no
    * mapped symbol ever contains a literal space char (byte 0x20 maps
    * to Ġ, and every symbol char is printable) — the same property
    * that makes the format work for GPT-2 itself. Unlike WordPiece's
    * vocab.txt, the artifact carries FULL training provenance (ranked
    * merges), so an imported model is rank-identical, not merely
    * encode-identical. Byte-deterministic: retraining writes identical
    * bytes (spec-pinned). */
  def saveMerges(model: Model, path: java.nio.file.Path): Unit = {
    val lines = "#version: 0.2" +: model.merges.map(m => m._1 + " " + m._2)
    java.nio.file.Files.write(path,
      lines.mkString("", "\n", "\n").getBytes("UTF-8"))
  }

  /** Load a `merges.txt` artifact (ours or a GPT-2/HF checkpoint's)
    * back into a [[Model]]. `#`-prefixed header lines and blanks are
    * skipped; each remaining line is one `a b` merge in rank order.
    * The artifact format carries no pre-tokenizer metadata (GPT-2's
    * own doesn't either), so `pretok` names the mode the checkpoint
    * was trained under — pass [[PretokGpt2]] when importing a real
    * GPT-2/HF checkpoint to get encode parity on ASCII-whitespace
    * text (see [[Gpt2Pattern]]). */
  def loadMerges(path: java.nio.file.Path,
      pretok: String = PretokSpace): Model = {
    import scala.jdk.CollectionConverters._
    val lines = java.nio.file.Files.readAllLines(path,
      java.nio.charset.StandardCharsets.UTF_8).asScala
    val merges = lines.iterator
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val sp = l.indexOf(' ')
        require(sp > 0 && sp < l.length - 1 && l.indexOf(' ', sp + 1) < 0,
          s"malformed merges.txt line: '$l'")
        (l.substring(0, sp), l.substring(sp + 1))
      }.toVector
    Model(merges, pretok)
  }

  /** Learned token count without materializing token arrays (the
    * packing/budget divisor — [[Bpe.tokenCount]]'s shape). */
  def tokenCount(model: Model)(text: Column): Column = {
    val rank = model.rank
    val pretok = model.pretok
    val memo = new TaskMemo[Integer]
    val f = udf { (s: String) =>
      if (s == null) 0
      else {
        var n = 0
        pretokens(s, pretok).foreach { w =>
          n += memo.get(w,
            x => Integer.valueOf(Bpe.applyMerges(baseSymbols(x), rank).length))
        }
        n
      }
    }
    f(text)
  }
}
