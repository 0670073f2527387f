package graft.examples

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scratch A/B: old (no persist) vs new (persisted count tables) forms of
  * the LanguageModel operators, alternated in one JVM so host drift hits
  * both arms. Not part of the driver contract. */
object AbLang {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sf)

    def key(c: Column): Column = xxhash64(c)
    def docBigrams(df: DataFrame): DataFrame =
      df.select(col("doc_id").as("id"), split(col("text"), " ").as("t"))
        .select(col("id"),
          explode(when(size(col("t")) >= 2,
            transform(sequence(lit(0), size(col("t")) - 2),
              i => struct(element_at(col("t"), i + 1).as("w1"),
                element_at(col("t"), i + 2).as("w2"))))
            .otherwise(array())).as("b"))
        .select(col("id"), key(col("b.w1")).as("w1"), key(col("b.w2")).as("w2"))

    // OLD trigram form (HEAD^ shape: no persist, corpus-Expand nv)
    def oldTrigram(df: DataFrame): DataFrame = {
      val (l3, l2, l1) = (0.6, 0.3, 0.1)
      val tg = df.select(col("doc_id").as("id"), split(col("text"), " ").as("t"))
        .select(col("id"),
          explode(when(size(col("t")) >= 3,
            transform(sequence(lit(0), size(col("t")) - 3),
              i => struct(element_at(col("t"), i + 1).as("w1"),
                element_at(col("t"), i + 2).as("w2"),
                element_at(col("t"), i + 3).as("w3"))))
            .otherwise(array())).as("g"))
        .select(col("id"), key(col("g.w1")).as("w1"), key(col("g.w2")).as("w2"),
          key(col("g.w3")).as("w3"))
      val bg = docBigrams(df)
      val c3 = tg.groupBy(col("w1"), col("w2"), col("w3"))
        .agg(count(lit(1)).as("c3"))
      val ch3 = c3.groupBy(col("w1"), col("w2")).agg(sum(col("c3")).as("ch3"))
      val cb = bg.groupBy(col("w1").as("b1"), col("w2").as("b2"))
        .agg(count(lit(1)).as("cb"))
      val chb = cb.groupBy(col("b1")).agg(sum(col("cb")).as("chb"))
        .withColumnRenamed("b1", "h1")
      val toks = df.select(explode(split(col("text"), " ")).as("tok0"))
      val cu = toks.select(key(col("tok0")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cu"))
      val nv = toks
        .agg(count(lit(1)).as("n_tok"), countDistinct(key(col("tok0"))).as("v"))
      val p3 = (col("c3") + lit(1.0)) / (col("ch3") + col("v"))
      val p2 = (col("cb") + lit(1.0)) / (col("chb") + col("v"))
      val p1 = (col("cu") + lit(1.0)) / (col("n_tok") + col("v"))
      tg.join(c3, Seq("w1", "w2", "w3")).join(ch3, Seq("w1", "w2"))
        .join(cb, col("w2") === col("b1") && col("w3") === col("b2"))
        .join(chb, col("w2") === col("h1"))
        .join(cu, col("w3") === cu("w"))
        .crossJoin(broadcast(nv))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_trigrams"),
          (floor(avg(log(lit(l3) * p3 + lit(l2) * p2 + lit(l1) * p1))
            * 10000 + lit(0.5)) / 10000).as("ll"))
        .select(col("id").as("doc_id"), col("n_trigrams"), col("ll"))
        .orderBy(col("doc_id"))
    }

    // OLD bigram LL (no persist)
    def oldBigram(df: DataFrame): DataFrame = {
      val bg = docBigrams(df)
      val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      val ch = cb.groupBy(col("w1")).agg(sum(col("cb")).as("ch"))
      val v = df.select(explode(split(col("text"), " ")).as("tok0"))
        .agg(countDistinct(key(col("tok0"))).as("v"))
      bg.join(cb, Seq("w1", "w2")).join(ch, Seq("w1")).crossJoin(broadcast(v))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_bigrams"),
          (floor(avg(log((col("cb") + lit(1.0)) / (col("ch") + col("v"))))
            * 10000 + lit(0.5)) / 10000).as("ll"))
        .select(col("id").as("doc_id"), col("n_bigrams"), col("ll"))
        .orderBy(col("doc_id"))
    }

    def newTrigram(df: DataFrame): DataFrame =
      graft.operators.LanguageModel.trigramInterpolatedLL(df, "doc_id",
        "text", hashTokens = true).orderBy(col("doc_id"))
    def newBigram(df: DataFrame): DataFrame =
      graft.operators.LanguageModel.bigramLogLikelihood(df, "doc_id",
        "text", hashTokens = true).orderBy(col("doc_id"))

    def run(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    // warm both
    run(oldTrigram(docs)); run(newTrigram(docs))
    run(oldBigram(docs)); run(newBigram(docs))
    val reps = 5
    val results = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      results("old_t22") ::= run(oldTrigram(docs))
      results("new_t22") ::= run(newTrigram(docs))
      results("old_t11") ::= run(oldBigram(docs))
      results("new_t11") ::= run(newBigram(docs))
    }
    results.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"AB $k min=${v.min}%.3f med=${v.sorted.apply(v.size / 2)}%.3f")
    }
    spark.stop()
  }
}
