package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration this engine assumes everywhere.
  *
  * Tuned for correctness-parity with the DuckDB oracle (UTC, ANSI off) and
  * for scale: AQE on (runtime coalesce + skew-join splitting), shuffle
  * partitions sized to the local core count rather than Spark's default 200.
  * On a real cluster the same builder is used with `master` unset and
  * `spark.sql.shuffle.partitions` sized to ~2-3x total cores.
  */
object GraftSession {
  def builder(master: String = sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"),
              shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
      : SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // Spark 4 defaults ANSI on; the reference's Option-style parses expect
      // malformed casts to yield null, not throw — match that engine-wide
      .config("spark.sql.ansi.enabled", "false")
      // native graft functions + RangeJoinRule, the way a deployed
      // library installs them (works on spark-submit --conf too)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // our sketch Aggregator buffers serialize as byte arrays; keep the
      // objectHashAggregate path available for them
      .config("spark.sql.execution.useObjectHashAggregateExec", "true")
      // events.parquet carries TIMESTAMP(NANOS); Spark has no nanos type —
      // read as long and normalize in Tables.events
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)

  def get(): SparkSession = {
    // SPARK_GRAFT_JARS: app jar(s) to ship to remote executors when the
    // master is a real cluster (standalone/yarn) instead of local[n]
    val withJars = sys.env.get("SPARK_GRAFT_JARS")
      .fold(builder())(j => builder().config("spark.jars", j))
    val spark = withJars.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
