package graft.examples

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch A/B: old vs new forms of round-16 optimization targets,
  * alternated in one JVM so host drift hits both arms equally.
  * Not part of the driver contract. */
object AbMisc {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val arms = scala.collection.mutable.LinkedHashMap.empty[String, () => DataFrame]
    val which = if (args.isEmpty) Set("q40") else args.toSet

    if (which("q40")) {
      // OLD q40: two back-to-back fact exchanges
      arms("old_q40") = () => {
        val perOrd = Tables.lineitem(spark, sf)
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(count(when(col("l_returnflag") === "R", 1)).as("n_fault_rows"))
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_supp"),
            sum((col("n_fault_rows") > 0).cast("long")).as("n_fault_supp"),
            max(when(col("n_fault_rows") > 0, col("l_suppkey"))).as("fault_suppkey"),
            max(when(col("n_fault_rows") > 0, col("n_fault_rows"))).as("fault_rows"))
        val o = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"))
        val sup = Tables.supplier(spark, sf).select(col("s_suppkey"), col("s_name"))
        perOrd
          .filter(col("n_supp") > 1 && col("n_fault_supp") === 1)
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(sup), col("fault_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(sum(col("fault_rows")).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(20)
      }
      arms("new_q40") = () =>
        graft.operators.CoreQueries.q21AggRewrite(spark, sf)
    }

    def run(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      t
    }
    arms.values.foreach(a => run(a())) // warm
    val reps = 5
    val results = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      arms.foreach { case (k, a) => results(k) ::= run(a()) }
    }
    results.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"AB $k min=${v.min}%.3f med=${v.sorted.apply(v.size / 2)}%.3f")
    }
    spark.stop()
  }
}
