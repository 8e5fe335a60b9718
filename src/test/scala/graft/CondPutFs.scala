package graft

import org.apache.hadoop.fs.{FSDataOutputStream, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A Hadoop `FileSystem` modeling the OBJECT-STORE WORST CASE for the
  * table-format commit protocol (VERDICT r14 task 2):
  *
  *  - `rename` is NEVER atomic-if-absent: it silently REPLACES an
  *    existing destination (the copy-then-delete semantics of S3-class
  *    stores). Any protocol step that relied on rename for mutual
  *    exclusion — including the exists+rename pair
  *    [[graft.ext.TableLog]] used before r15 — loses updates here.
  *  - the ONLY atomic primitive offered is CREATE-IF-ABSENT
  *    (`create(path, overwrite=false)`), implemented with an O_EXCL
  *    `Files.createFile` so two racing creators cannot both succeed —
  *    the conditional-put (`if-none-match`) every real object store
  *    exposes.
  *
  * TableLogSpec runs the full lifecycle, the crash-orphan story, a
  * concurrent reader, and an N-writer optimistic-retry race against
  * this scheme — turning the scaladoc claim "publish is the single
  * conditional-put swap point" into tested code. Test-scope only.
  */
class CondPutFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "condput"
  override def getUri: java.net.URI = java.net.URI.create("condput:///")

  // worst-case store: rename always clobbers an existing destination
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst) && getFileStatus(dst).isFile) delete(dst, false)
    super.rename(src, dst)
  }

  // the one atomic primitive: O_EXCL create-if-absent
  override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream = {
    if (!overwrite) {
      val local = pathToFile(f)
      if (local.getParentFile != null)
        java.nio.file.Files.createDirectories(local.getParentFile.toPath)
      try java.nio.file.Files.createFile(local.toPath) // atomic O_EXCL
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"condput: $f already exists (${e.getMessage})")
      }
      super.create(f, permission, true, bufferSize, replication,
        blockSize, progress)
    } else super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }
}
