package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC/Postgres source — capability parity with the reference's
  * `Postgres` connector (/root/reference/amadeus-postgres/src/lib.rs:
  * 71-86), whose `PostgresSelect::{Table, Query}` forms map 1:1 onto
  * Spark's JDBC `dbtable` / `query` options.
  *
  * The reference streams `COPY (SELECT ...) TO STDOUT (FORMAT BINARY)`
  * per source; Spark's JDBC source adds what the reference lacks:
  * predicate pushdown into the remote SQL, and partitioned parallel reads
  * via (partitionColumn, lowerBound, upperBound, numPartitions) — at
  * 100 TB the partitioned form is mandatory and the default single-split
  * read should only be used for dimension tables.
  *
  * No database exists in this container, so this module is exercised for
  * plan construction only (JdbcSpec); the semantics are Spark built-ins.
  */
object Jdbc {

  sealed trait Select
  /** whole table (reference PostgresSelect::Table) */
  final case class Table(name: String) extends Select
  /** arbitrary SQL (reference PostgresSelect::Query) */
  final case class Query(sql: String) extends Select

  final case class Partitioning(column: String, lower: Long, upper: Long, num: Int)

  def read(spark: SparkSession, url: String, select: Select,
      props: Map[String, String] = Map.empty,
      partitioning: Option[Partitioning] = None): DataFrame = {
    var r = spark.read.format("jdbc").option("url", url)
    select match {
      case Table(n) => r = r.option("dbtable", n)
      case Query(q) => r = r.option("query", q)
    }
    props.foreach { case (k, v) => r = r.option(k, v) }
    partitioning.foreach { p =>
      r = r.option("partitionColumn", p.column)
        .option("lowerBound", p.lower).option("upperBound", p.upper)
        .option("numPartitions", p.num)
    }
    r.load()
  }

  /** writer side (the reference's Destination is unimplemented —
    * README.md:58-66 "🔨 WIP" — so this exceeds it) */
  def write(df: DataFrame, url: String, table: String,
      mode: String = "append", props: Map[String, String] = Map.empty): Unit = {
    var w = df.write.format("jdbc").option("url", url).option("dbtable", table)
    props.foreach { case (k, v) => w = w.option(k, v) }
    w.mode(mode).save()
  }
}
