package graft.sources

import java.io.{IOException, InputStream}

import org.apache.hadoop.fs.FSInputStream

/** Retrying, position-resuming input stream — parity with the reference's
  * S3 partition reads (/root/reference/amadeus-aws/src/file.rs:18-205),
  * which wrap every GetObject in bounded retries and RESUME AT THE FAILED
  * OFFSET rather than restarting the object. In production Hadoop's `s3a`
  * connector carries its own retry policy; this wrapper provides the same
  * guarantee for any `FileSystem` whose `open` can supply a stream at an
  * offset, and is exercised end-to-end through the flaky mock object
  * store in ObjectStoreSpec (a whole parquet scan survives injected
  * transient failures and returns bit-identical results).
  *
  * `pos` only advances on successful reads, so a retry reopens exactly at
  * the first unread byte — no bytes are skipped or double-counted.
  *
  * @param openAt   factory producing a fresh stream positioned at the
  *                 given byte offset (called on first use, on seek, and
  *                 on each retry)
  * @param maxRetries transient failures tolerated per read call
  * @param backoffMs  linear backoff base between attempts
  */
class RetryingInputStream(openAt: Long => InputStream,
    maxRetries: Int = 4, backoffMs: Long = 5) extends FSInputStream {

  private var pos = 0L
  private var in: InputStream = _

  private def closeQuietly(): Unit =
    if (in != null) { try in.close() catch { case _: IOException => } ; in = null }

  private def ensureOpen(): Unit = if (in == null) in = openAt(pos)

  private def withRetry[T](f: => T): T = {
    var attempt = 0
    while (true) {
      // the reopen itself is retried too: a transient failure on the
      // re-GET (connection refused right after a dropped read — the most
      // common object-store failure mode) must consume retry budget, not
      // escape the loop
      try { ensureOpen(); return f }
      catch {
        case e: IOException =>
          attempt += 1
          if (attempt > maxRetries) throw e
          closeQuietly()
          Thread.sleep(backoffMs * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def seek(p: Long): Unit = {
    if (p != pos) { closeQuietly(); pos = p }
  }

  override def getPos: Long = pos

  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(): Int = withRetry {
    val b = in.read()
    if (b >= 0) pos += 1
    b
  }

  override def read(buf: Array[Byte], off: Int, len: Int): Int = withRetry {
    val n = in.read(buf, off, len)
    if (n > 0) pos += n
    n
  }

  override def close(): Unit = closeQuietly()
}
