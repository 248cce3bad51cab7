package graft.hadoop

import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._

import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `file:` scheme [[LocalFileSystem]] whose permission calls stay
  * in-process.
  *
  * Without the native Hadoop library, `RawLocalFileSystem.setPermission`
  * forks a `chmod` PROCESS per call (`Shell.execCommand`, verified in
  * the 3.4.2 bytecode), and every `FileSystem.create` and
  * permissioned `mkdirs` routes through it — one fork (~5-15 ms) per
  * file written. A multi-file parquet/ORC commit (task files,
  * `_temporary` dirs, `_SUCCESS`) pays dozens of forks; the
  * lakehouse-operator keys pay hundreds across their snapshot writes.
  * JDK NIO sets POSIX permissions in-process with the identical
  * result, so the override is behavior-preserving — only the syscall
  * path changes. Registered for the `file:` scheme via
  * `spark.hadoop.fs.file.impl` ([[graft.GraftSession]]); cluster
  * schemes (hdfs:, s3a:) are untouched, and deployments with the
  * native library see the same in-process behavior they already had.
  */
class FastLocalFileSystem
    extends LocalFileSystem(new FastRawLocalFileSystem)

class FastRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val bits = permission.toShort.toInt
    val set = java.util.EnumSet.noneOf(classOf[PosixFilePermission])
    def add(bit: Int, perm: PosixFilePermission): Unit = {
      if ((bits & bit) != 0) set.add(perm); ()
    }
    add(0x100, OWNER_READ); add(0x80, OWNER_WRITE); add(0x40, OWNER_EXECUTE)
    add(0x20, GROUP_READ); add(0x10, GROUP_WRITE); add(0x8, GROUP_EXECUTE)
    add(0x4, OTHERS_READ); add(0x2, OTHERS_WRITE); add(0x1, OTHERS_EXECUTE)
    Files.setPosixFilePermissions(pathToFile(p).toPath, set)
    ()
  }
}
