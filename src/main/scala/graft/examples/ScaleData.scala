package graft.examples

import graft.{GraftSession, Tables}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** sf1 generator for the scale smoke (VERDICT r3 next-round #8): build a
  * 10× corpus from sf0.1 by replication with key offsets, so the heavy
  * queries (d02/d12/t11/q34) can be timed one decade up and super-linear
  * behavior caught before it ships. Writes `target/sf1/<table>.parquet`.
  *
  * Fact keys are offset per copy so joins stay key-correct (each copy is
  * a disjoint key space; q34's join cardinality scales exactly 10×).
  * Dimension tables (region/nation/supplier/part) are fixed-size at any
  * corpus scale — copied through unchanged, exactly the 100 TB shape.
  *
  * Documents get a per-copy SALT TOKEN inserted after every 2nd token:
  * every 3-shingle then contains a copy-specific token, so docs from
  * different copies share no shingles and the planted near-dup structure
  * scales LINEARLY (10×25 pairs), instead of every doc acquiring 9
  * cross-copy twins and turning d02's sparse-candidate regime into a
  * dense one the sf0.1 bench never exercises.
  */
object ScaleData {

  def saltedDocs(df: DataFrame, copy: Int): DataFrame =
    df.withColumn("doc_id", col("doc_id") + lit(copy * 1000000L))
      .withColumn("text",
        array_join(transform(split(col("text"), " "),
          (t, i) => when(i % 2 === 1, concat(t, lit(s" zcp${copy}z")))
            .otherwise(t)), " "))
      .withColumn("n_chars", length(col("text")))

  def main(args: Array[String]): Unit = {
    val src = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rep(name: String, f: (DataFrame, Int) => DataFrame): Unit = {
      val base = Tables.load(spark, src, name)
      val all = (0 until copies).map(i => f(base, i)).reduce(_ unionByName _)
      all.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"SCALE $name rows=${spark.read.parquet(s"$out/$name.parquet").count()}")
    }
    val off = 1000000L
    rep("lineitem", (df, i) => df
      .withColumn("l_orderkey", col("l_orderkey") + lit(i * off)))
    rep("orders", (df, i) => df
      .withColumn("o_orderkey", col("o_orderkey") + lit(i * off))
      .withColumn("o_custkey", col("o_custkey") + lit(i * off)))
    rep("customer", (df, i) => df
      .withColumn("c_custkey", col("c_custkey") + lit(i * off)))
    rep("documents", (df, i) => saltedDocs(df, i))
    // events: disjoint users per copy — per-user windows (sessions,
    // cohorts, transition edges) scale 10× in user count while the
    // k-transition graph keeps its node set (edge multiplicity grows)
    rep("events", (df, i) => df
      .withColumn("event_id", col("event_id") + lit(i * off))
      .withColumn("user_id", col("user_id") + lit(i * off)))
    // fixed-size dims + tables the heavies don't scale: pass-through copy
    Seq("region", "nation", "supplier", "part", "embeddings").foreach { t =>
      Tables.load(spark, src, t)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$t.parquet")
    }
    spark.stop()
  }
}
