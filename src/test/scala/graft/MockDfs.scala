package graft

/** A Hadoop `FileSystem` registered under the `mockdfs://` scheme,
  * delegating to the local filesystem. Exists to prove the engine's
  * registration layer is URI-scheme agnostic: pointing
  * [[graft.catalog.Tables.register]] at an object store (s3a, abfs,
  * gs) is connector-jar + `fs.&lt;scheme&gt;.impl` CONFIG in stock
  * Spark/Hadoop, not code — this class is the sandbox-testable stand-in
  * for such a connector (the sandbox has no cloud egress). Test-scope
  * only; nothing in the library references it.
  */
class MockDfs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockdfs"
  override def getUri: java.net.URI = java.net.URI.create("mockdfs:///")
}
