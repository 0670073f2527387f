package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021, "Scaling
  * Language Models: Methods, Analysis & Insights from Training Gopher",
  * Appendix A1.1) — the standard rule battery a large-scale pretraining
  * corpus is filtered through before dedup. Two packs:
  *
  *  - [[gopherRuleFlags]]: doc-level rules (word count, mean word
  *    length, symbol/word ratio, bullet / ellipsis line fractions,
  *    alphabetic-word fraction, stopword presence) as one narrow
  *    codegen'd struct — no shuffle, no UDF; evaluates in the scan
  *    stage at any corpus size.
  *  - [[topNgramCharFractions]]: the repetition battery's top-n-gram
  *    character fractions (fraction of the document's characters
  *    covered by its most repeated n-gram), one gram-keyed shuffle for
  *    all requested n at once, with the same `hashGrams` 100 TB switch
  *    as `Dedup.duplicateSpans` (shuffle 8-byte longs, not strings).
  *
  * The reference has no quality-rule layer (it stops at the Value/Group
  * data model); this extends the LLM-pipeline pack alongside
  * `TextFunctions.qualityScore` (t02) with the published rule set.
  */
object QualityRules {

  /** Gopher's required-stopword list (A1.1: "contains at least two of
    * the following English words"). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Doc-level Gopher rules over a whitespace-tokenized text column.
    * Returns a struct column with the raw metrics and one boolean per
    * rule (true = passes), plus `keep` = AND of all rules:
    *
    *  - `r_word_count`:  50 ≤ words ≤ 100,000
    *  - `r_mean_len`:    3 ≤ mean word length ≤ 10
    *  - `r_symbol`:      (#'#' + #'...' + #'…') / words ≤ 0.1
    *  - `r_bullet`:      ≤ 90% of lines start with a bullet (• or -)
    *  - `r_ellipsis`:    ≤ 30% of lines end with an ellipsis
    *  - `r_alpha`:       ≥ 80% of words contain an alphabetic character
    *  - `r_stop`:        ≥ 2 distinct [[GopherStopwords]] present
    *
    * All ratios are integer-count / integer-count IEEE divisions —
    * bit-identical across engines, so the rule booleans are
    * hash-verifiable (gate t17). Null text fails every rule. */
  def gopherRuleFlags(c: Column): Column = {
    val t = split(c, " ")
    val nWords = size(t).cast("double")
    val charSum = aggregate(t, lit(0L), (a, x) => a + length(x)).cast("double")
    val meanLen = charSum / nWords
    val hashes = (length(c) - length(regexp_replace(c, "#", ""))).cast("double")
    val dots = ((length(c) - length(regexp_replace(c, "\\.\\.\\.", ""))) / 3).cast("double")
    val uni = (length(c) - length(regexp_replace(c, "…", ""))).cast("double")
    val symbolRatio = (hashes + dots + uni) / nWords
    val lines = split(c, "\n")
    val nLines = size(lines).cast("double")
    val bulletFrac = size(filter(lines,
      l => l.startsWith("•") || l.startsWith("- "))).cast("double") / nLines
    val ellipsisFrac = size(filter(lines,
      l => l.endsWith("...") || l.endsWith("…"))).cast("double") / nLines
    val alphaFrac = size(filter(t, x => x.rlike("[A-Za-z]"))).cast("double") / nWords
    val stopHits = size(array_intersect(t,
      array(GopherStopwords.map(lit): _*)))
    val rules: Seq[(String, Column)] = Seq(
      "r_word_count" -> nWords.between(50, 100000),
      "r_mean_len" -> meanLen.between(3.0, 10.0),
      "r_symbol" -> (symbolRatio <= 0.1),
      "r_bullet" -> (bulletFrac <= 0.9),
      "r_ellipsis" -> (ellipsisFrac <= 0.3),
      "r_alpha" -> (alphaFrac >= 0.8),
      "r_stop" -> (stopHits >= 2))
    val flags = rules.map { case (_, r) => coalesce(r, lit(false)) }
    struct(
      (Seq(size(t).cast("long").as("n_words"),
        (floor(meanLen * 10000 + lit(0.5)) / 10000).as("mean_word_len"),
        stopHits.cast("long").as("n_stopwords")) ++
        rules.map(_._1).zip(flags).map { case (n, f) => f.as(n) } :+
        flags.reduce(_ && _).as("keep")): _*)
  }

  /** Keep only documents passing every Gopher doc-level rule. */
  def gopherFilter(df: DataFrame, textCol: String): DataFrame =
    df.filter(gopherRuleFlags(col(textCol)).getField("keep"))

  /** Gopher repetition battery: for each n in `ns`, the fraction of the
    * document's characters covered by its most repeated word n-gram
    * (deterministic form: max over grams occurring ≥ 2 times of
    * occurrences × gram-length, over total characters; 0.0 when no
    * n-gram repeats — a doc that never repeats an n-gram has no
    * repetition mass). Gopher drops docs whose fraction exceeds
    * 0.20 / 0.18 / 0.16 for n = 2 / 3 / 4; [[topNgramThresholds]] holds
    * those constants and the output carries one boolean per n.
    *
    * Plan at 100 TB: this is a PER-DOCUMENT statistic, so it costs NO
    * shuffle — the count-and-argmax runs per row in the native
    * codegen'd [[graft.plans.TopGramMassExpression]] (exact UTF8 gram
    * comparison, no hash-collision caveat): one narrow projection,
    * shuffle volume independent of the corpus. The relational
    * grams-exchange form this replaced ([[topNgramCharFractionsRelational]],
    * kept as the parity witness + oracle documentation) was the worst
    * sf1 scaler in the benchmark (3.95× at 10× data) purely from
    * shuffling every document's gram stream.
    *
    * @return idCol, `chars`, and per n: `top{n}_frac` (floor-rounded to
    *         4 decimals) and `r_top{n}` (true = within threshold)
    */
  def topNgramCharFractions(df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"bad n list: $ns")
    val toks = split(col(textCol), " ")
    val base = df.select(col(idCol), toks.as("__t"),
      length(col(textCol)).cast("double").as("__chars"))
    val cols = ns.flatMap { n =>
      val frac = graft.plans.TopGramMassExpression.topGramMass(col("__t"), n)
        .cast("double") / col("__chars")
      Seq((floor(frac * 10000 + lit(0.5)) / 10000).as(s"top${n}_frac"),
        (frac <= topNgramThresholds.getOrElse(n, 1.0)).as(s"r_top$n"))
    }
    base.select((col(idCol) +: col("__chars").cast("long").as("chars") +: cols): _*)
  }

  /** The relational (grams-exchange) form of [[topNgramCharFractions]] —
    * gram stream exploded and counted through a (doc, n, gram)-keyed
    * exchange, `hashGrams` projecting xxhash64 before the shuffle. Kept
    * as the parity witness (PlanExprSpec asserts equality with the
    * narrow native form corpus-wide) and as the shape the DuckDB oracle
    * documents; production callers want [[topNgramCharFractions]]. */
  def topNgramCharFractionsRelational(df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3, 4), hashGrams: Boolean = false): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), s"bad n list: $ns")
    val toks = split(col(textCol), " ")
    val base = df.select(col(idCol).as("id"), toks.as("t"),
      length(col(textCol)).cast("double").as("chars"))
    def gramKey(c: Column): Column = if (hashGrams) xxhash64(c) else c
    val grams = ns.map { n =>
      base.select(col("id"), lit(n).as("n"),
        explode(when(size(col("t")) >= n,
          transform(sequence(lit(0), size(col("t")) - n),
            i => array_join(slice(col("t"), i + 1, lit(n)), " ")))
          .otherwise(array())).as("g"))
        .select(col("id"), col("n"), gramKey(col("g")).as("gk"),
          length(col("g")).as("glen"))
    }.reduce(_.unionByName(_))
    val counted = grams.groupBy(col("id"), col("n"), col("gk"))
      .agg(count(lit(1)).as("cnt"), first(col("glen")).as("glen"))
    val mass = counted.filter(col("cnt") >= 2)
      .groupBy(col("id"), col("n"))
      .agg(max(col("cnt") * col("glen")).as("mass"))
    val wide = mass.groupBy(col("id"))
      .pivot("n", ns)
      .agg(first(col("mass")))
    val out = base.select(col("id"), col("chars"))
      .join(wide, Seq("id"), "left_outer")
    val cols = ns.flatMap { n =>
      val frac = coalesce(col(s"$n"), lit(0L)).cast("double") / col("chars")
      Seq((floor(frac * 10000 + lit(0.5)) / 10000).as(s"top${n}_frac"),
        (frac <= topNgramThresholds.getOrElse(n, 1.0)).as(s"r_top$n"))
    }
    out.select((col("id").as(idCol) +: col("chars").cast("long").as("chars") +:
      cols): _*)
  }

  /** Gopher A1.1 top-n-gram character-fraction thresholds. */
  val topNgramThresholds: Map[Int, Double] =
    Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
}
