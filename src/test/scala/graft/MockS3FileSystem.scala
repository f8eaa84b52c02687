package graft

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.RawLocalFileSystem

/** In-JVM S3 stand-in for the accessor-dispatch tests: a Hadoop
  * FileSystem registered for the `s3a` scheme (via
  * `fs.s3a.impl=graft.MockS3FileSystem`) whose objects live on the
  * local disk — `s3a://<bucket>/<path>` maps to the local file at
  * `<path>`. Every engine IO path (Formats read/write, Memo,
  * listFolder) reaches it through the exact same registry lookup that
  * resolves the real `S3AFileSystem` in production (reference parity:
  * the porcupine-s3 accessor, TaskPipelineUtils.hs:77-175) — what the
  * sandbox cannot exercise is only the wire protocol behind that
  * interface, since the hadoop-aws jar isn't shipped here.
  *
  * The only deviations from RawLocalFileSystem are the scheme/URI
  * identity: paths check, qualify, and list back as `s3a://bucket/...`.
  */
class MockS3FileSystem extends RawLocalFileSystem {
  private var mockUri: URI = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    // pin the filesystem identity BEFORE super.initialize — the base
    // class qualifies its working directory against getUri
    mockUri = URI.create(name.getScheme + "://" + name.getAuthority)
    super.initialize(name, conf)
  }

  // the base-class CONSTRUCTOR already qualifies its working dir
  // against getUri, before initialize has run — serve a scheme-only
  // placeholder until the real bucket URI is known
  override def getUri: URI =
    if (mockUri == null) URI.create("s3a:///") else mockUri
  override def getScheme: String = "s3a"

  // the base class returns lazy statuses whose permission load does
  // `new File(path.toUri)` — impossible for an s3a URI. Materialize
  // plain FileStatus values instead (default permissions, like a real
  // object store's): the path identity is what the tests exercise.
  private def plain(st: org.apache.hadoop.fs.FileStatus)
      : org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(st.getLen, st.isDirectory,
      st.getReplication, st.getBlockSize, st.getModificationTime,
      st.getAccessTime, null, null, null, st.getPath)

  override def getFileStatus(f: org.apache.hadoop.fs.Path)
      : org.apache.hadoop.fs.FileStatus = plain(super.getFileStatus(f))

  override def listStatus(f: org.apache.hadoop.fs.Path)
      : Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(plain)
}

/** The FileContext face of the same mock: the engine's memo publishes
  * via FileContext.rename (atomic-rename-aside), which resolves
  * `fs.AbstractFileSystem.s3a.impl` independently of `fs.s3a.impl`. */
class MockS3AbstractFileSystem(uri: URI, conf: Configuration)
    extends org.apache.hadoop.fs.DelegateToFileSystem(
      uri, new MockS3FileSystem, conf, "s3a", false)
