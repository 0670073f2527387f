package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterEach, Suite}

/** Clears the shared session's cached plans after every test.
  *
  * The suites share one JVM-wide SparkSession (GraftSession.getOrCreate),
  * and several operators persist intermediates (dedup signatures, ANN
  * indexes, candidate pairs). Spark's CacheManager matches EVERY new
  * query's plan against EVERY cached plan during analysis, so leaked
  * caches make each subsequent test pay an analysis tax that grows with
  * everything run before it — measured as a full-suite slowdown from ~2
  * to ~15+ minutes. Tests are independent; drop the cache between them.
  */
trait CacheHygiene extends BeforeAndAfterEach { this: Suite =>
  def spark: SparkSession
  override def afterEach(): Unit =
    try spark.catalog.clearCache() finally super.afterEach()
}
