package org.apache.spark.sql.execution.streaming.checkpointing

import java.io.{File, FileNotFoundException, InputStream, OutputStream}
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption, Path => JPath}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileStatus, FSDataInputStream, Path, PathFilter, PositionedReadable, Seekable}

import CheckpointFileManager.CancellableFSDataOutputStream

/** [[CheckpointFileManager]] for `file:` checkpoints backed directly by
  * `java.nio` — zero Hadoop local-filesystem overhead.
  *
  * Why it exists: without the native Hadoop library (the common case on
  * dev boxes and CI), every create/rename on Hadoop's local filesystem
  * FORKS A PROCESS — `RawLocalFileSystem.setPermission` shells out to
  * `chmod` on each file create, and the FileContext rename path shells
  * out to `readlink` per `getFileLinkStatus` probe. A streaming
  * micro-batch commits an offset-WAL file, a commit-WAL file and one
  * state-store delta per state partition, so a bounded tape replay at
  * 8 state partitions pays ~30 forks per micro-batch (~5-15 ms each —
  * measured as the bulk of `walCommit`/`commitOffsets` and a large
  * slice of `addBatch` in `StreamingQueryProgress.durationMs`, and
  * confirmed by stack sampling: `Shell.runCommand` under
  * `RawLocalFileSystem.{setPermission, deprecatedGetFileLinkStatusInternal}`).
  * `java.nio` performs the identical create-temp + atomic-rename
  * protocol in-process.
  *
  * Semantics match [[FileContextBasedCheckpointFileManager]] for the
  * single-writer local case: createAtomic writes `.name.uuid.tmp` in
  * the target directory and atomically moves it into place on close
  * (REPLACE_EXISTING iff overwriteIfPossible; a losing non-overwrite
  * race throws Hadoop's FileAlreadyExistsException, which
  * HDFSMetadataLog already handles). Only `file:`/no-scheme paths are
  * supported — a durable deployment (HDFS/S3) keeps the default
  * manager; select this one per checkpoint via
  * `spark.sql.streaming.checkpointFileManagerClass`.
  */
class NioCheckpointFileManager(path: Path, conf: Configuration)
    extends CheckpointFileManager {
  import NioCheckpointFileManager._

  require(path.toUri.getScheme == null || path.toUri.getScheme == "file",
    s"NioCheckpointFileManager only supports file: paths, got $path")

  override def createAtomic(p: Path,
                            overwriteIfPossible: Boolean)
      : CancellableFSDataOutputStream = {
    val target = jpath(p)
    val parent = target.getParent
    if (parent != null) Files.createDirectories(parent)
    if (!overwriteIfPossible && Files.exists(target))
      throw new FileAlreadyExistsException(
        s"Failed to create $target: destination exists")
    val tmp = parent.resolve(
      s".${target.getFileName}.${UUID.randomUUID()}.tmp")
    val out = new java.io.BufferedOutputStream(
      Files.newOutputStream(tmp, StandardOpenOption.CREATE_NEW,
        StandardOpenOption.WRITE), 64 * 1024)
    new NioAtomicStream(out, tmp, target, overwriteIfPossible)
  }

  override def open(p: Path): FSDataInputStream = {
    val ch =
      try FileChannel.open(jpath(p), StandardOpenOption.READ)
      catch { case _: java.nio.file.NoSuchFileException =>
        throw new FileNotFoundException(s"File does not exist: $p")
      }
    new FSDataInputStream(new NioSeekableInputStream(ch))
  }

  override def list(p: Path, filter: PathFilter): Array[FileStatus] = {
    val dir = jpath(p)
    if (!Files.exists(dir))
      throw new FileNotFoundException(s"File does not exist: $p")
    if (!Files.isDirectory(dir)) {
      val st = status(dir)
      return if (filter.accept(st.getPath)) Array(st) else Array.empty
    }
    val out = Array.newBuilder[FileStatus]
    val ds = Files.newDirectoryStream(dir)
    try {
      val it = ds.iterator()
      while (it.hasNext) {
        val st = status(it.next())
        if (filter.accept(st.getPath)) out += st
      }
    } finally ds.close()
    out.result()
  }

  override def mkdirs(p: Path): Unit = {
    Files.createDirectories(jpath(p)); ()
  }

  override def exists(p: Path): Boolean = Files.exists(jpath(p))

  override def delete(p: Path): Unit = {
    def rm(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
      f.delete(); ()
    }
    rm(jpath(p).toFile)
  }

  override def isLocal: Boolean = true

  override def createCheckpointDirectory(): Path = {
    Files.createDirectories(jpath(path))
    new Path(jpath(path).toUri)
  }
}

object NioCheckpointFileManager {
  private def jpath(p: Path): JPath = Paths.get(p.toUri.getPath)

  private def status(f: JPath): FileStatus = {
    val file = f.toFile
    new FileStatus(file.length(), file.isDirectory, 1, 64 * 1024 * 1024,
      file.lastModified(), new Path(f.toUri))
  }

  /** Write to `tmp`, atomically move to `target` on close. */
  private class NioAtomicStream(out: OutputStream, tmp: JPath,
                                target: JPath, overwrite: Boolean)
      extends CancellableFSDataOutputStream(out) {
    private var terminated = false

    override def close(): Unit = synchronized {
      if (!terminated) {
        terminated = true
        super.close()
        try {
          if (overwrite)
            Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
              StandardCopyOption.REPLACE_EXISTING)
          else
            Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            Files.deleteIfExists(tmp)
            throw new FileAlreadyExistsException(
              s"Failed to rename $tmp to $target: destination exists")
        }
        ()
      }
    }

    override def cancel(): Unit = synchronized {
      if (!terminated) {
        terminated = true
        try super.close() finally { Files.deleteIfExists(tmp); () }
      }
    }
  }

  /** Seekable/PositionedReadable adapter over a [[FileChannel]] — the
    * minimum [[FSDataInputStream]] requires of its wrapped stream. */
  private class NioSeekableInputStream(ch: FileChannel)
      extends InputStream with Seekable with PositionedReadable {
    override def read(): Int = {
      val b = ByteBuffer.allocate(1)
      if (ch.read(b) <= 0) -1 else b.get(0) & 0xff
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int =
      ch.read(ByteBuffer.wrap(b, off, len))

    override def available(): Int =
      math.min(Int.MaxValue.toLong, ch.size() - ch.position()).toInt

    override def close(): Unit = ch.close()

    override def seek(pos: Long): Unit = { ch.position(pos); () }
    override def getPos: Long = ch.position()
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(position: Long, buffer: Array[Byte], offset: Int,
                      length: Int): Int =
      ch.read(ByteBuffer.wrap(buffer, offset, length), position)

    override def readFully(position: Long, buffer: Array[Byte],
                           offset: Int, length: Int): Unit = {
      var done = 0
      while (done < length) {
        val n = read(position + done, buffer, offset + done, length - done)
        if (n < 0) throw new java.io.EOFException(
          s"EOF at ${position + done} reading $target")
        done += n
      }
    }
    private def target = ch.toString

    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
