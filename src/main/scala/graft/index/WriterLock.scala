package graft.index

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The reference's INDEX_WRITER_LOCK (`/root/reference/src/directory/lock.rs`;
  * `Index::writer` takes `.tantivy-writer.lock` in the index directory and a
  * second writer fails with `LockBusyError`,
  * `src/directory/directory.rs:101-142`). Manifest mutators here — builds,
  * merges, deletes — do a read-modify-write of `manifest.json`, so exactly
  * one writer per index directory may run at a time; this lock makes that
  * requirement enforceable ACROSS processes on any Hadoop filesystem with
  * create-if-absent (local, HDFS).
  *
  * Unlike an OS flock, a filesystem lock file survives a crashed holder —
  * the reference has the same property for its `Lock` files and surfaces it
  * as a busy error the operator resolves. `acquire(staleMs)` optionally
  * breaks a lock whose file is older than `staleMs` for janitor-style
  * recovery; the default never breaks.
  */
final class WriterLock private[index] (fs: FileSystem, val path: Path) {
  @volatile private var released = false
  def release(): Unit = if (!released) { released = true; fs.delete(path, false) }
}

object WriterLock {

  final class LockBusyException(msg: String) extends RuntimeException(msg)

  val LockFile = ".graft-writer.lock"

  def lockPath(indexDir: String): Path = new Path(indexDir, LockFile)

  /** Atomically create the lock file (create-if-absent), or throw
    * [[LockBusyException]] naming the current holder. A lock file older
    * than `staleMs` is broken once and re-acquired.
    */
  def acquire(spark: SparkSession, indexDir: String,
      holder: String = defaultHolder, staleMs: Long = Long.MaxValue): WriterLock = {
    val path = lockPath(indexDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(path.getParent)
    def tryCreate(): Option[WriterLock] =
      try {
        val out = fs.create(path, false)
        out.write(holder.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
        Some(new WriterLock(fs, path))
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => None
        case _: java.io.IOException if fs.exists(path) => None
      }
    tryCreate().getOrElse {
      val st = try Some(fs.getFileStatus(path)) catch { case _: java.io.IOException => None }
      val age = st.map(s => System.currentTimeMillis() - s.getModificationTime)
      if (age.exists(_ > staleMs)) {
        fs.delete(path, false)
        tryCreate().getOrElse(throw new LockBusyException(
          s"writer lock at $path re-taken while breaking a stale holder"))
      } else {
        val who = st.map { _ =>
          val in = fs.open(path)
          val b = org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
          in.close()
          new String(b, java.nio.charset.StandardCharsets.UTF_8)
        }.getOrElse("unknown")
        throw new LockBusyException(
          s"index at $indexDir already has a writer (holder: $who); " +
            "one writer per index directory — release or break the lock first")
      }
    }
  }

  /** Run `f` holding the writer lock; always released, even on failure. */
  def withLock[A](spark: SparkSession, indexDir: String,
      holder: String = defaultHolder, staleMs: Long = Long.MaxValue)(f: => A): A = {
    val l = acquire(spark, indexDir, holder, staleMs)
    try f finally l.release()
  }

  private def defaultHolder: String =
    s"${java.net.InetAddress.getLocalHost.getHostName}:pid=${ProcessHandle.current.pid}:t=${System.currentTimeMillis()}"
}
