package graft.sources

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Object-store parity double: a Hadoop `FileSystem` registered under the
  * `s3m://` scheme (bucket-style authority + key-style absolute paths)
  * that stores bytes on local disk. The container has zero egress, so the
  * `s3a://` production path can never execute here; this mock exercises
  * the exact same seam — scheme resolution via `fs.<scheme>.impl`, URI
  * authority handling, qualified-path listings, partition discovery and
  * committer renames all flow through `FileSystem` exactly as they would
  * against S3 (reference: amadeus-aws/src/file.rs S3File/S3Directory).
  *
  * Only two behaviors differ from RawLocalFileSystem: the FS identifies
  * as its mock URI (so `Path.getFileSystem` + qualification keep the
  * `s3m://bucket` prefix on every path Spark sees), and path checking
  * accepts the mock scheme. Everything else — byte IO via
  * `pathToFile(p) = new File(p.toUri.getPath)` — is inherited untouched.
  */
class S3MockFileSystem extends RawLocalFileSystem {

  private var mockUri: URI = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    mockUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
  }

  /** The superclass CONSTRUCTOR already qualifies the working directory
    * through getUri, before Scala field initializers run — fall back to a
    * placeholder until initialize() records the real authority. */
  override def getUri: URI =
    if (mockUri == null) URI.create("s3m://bucket") else mockUri

  /** Accept s3m paths (and the schemeless/file paths super produces
    * internally); RawLocalFileSystem would reject the mock scheme. */
  override protected def checkPath(path: Path): Unit = ()
}
