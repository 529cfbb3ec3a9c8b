package graft.util

import java.nio.file.Files
import java.nio.file.attribute.PosixFilePermission
import org.apache.hadoop.fs.{LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem whose chmod is an in-process syscall instead of a fork.
  *
  * Without libhadoop (this sandbox has none — "builtin-java classes" warning
  * at startup), Hadoop's RawLocalFileSystem shells out `chmod` for EVERY
  * setPermission — and setPermission runs on every file create and every
  * mkdir (FileOutputCommitter setup/commit, parquet part files, state-store
  * deltas, metadata logs). Forking a multi-GiB JVM per written file measured
  * hundreds of ms per task in write-heavy stages (r16 thread dumps:
  * 29/64 executor samples inside Shell.execCommand → setPermission).
  * java.nio sets the same bits with one native call and no fork.
  *
  * Semantics are unchanged: the permission BITS applied are exactly the
  * FsPermission's user/group/other triples (special bits — sticky/setuid —
  * are not representable via PosixFilePermission and are ignored, as no
  * artifact in this repo sets them). A real deployment loads libhadoop or
  * checkpoints to a DFS, where none of this path exists; this class is the
  * local-mode equivalent. Wired via `spark.hadoop.fs.file.impl`.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    val m: Int = permission.toShort.toInt
    val set = new java.util.HashSet[PosixFilePermission]()
    import PosixFilePermission._
    if ((m & 0x100) != 0) set.add(OWNER_READ)
    if ((m & 0x080) != 0) set.add(OWNER_WRITE)
    if ((m & 0x040) != 0) set.add(OWNER_EXECUTE)
    if ((m & 0x020) != 0) set.add(GROUP_READ)
    if ((m & 0x010) != 0) set.add(GROUP_WRITE)
    if ((m & 0x008) != 0) set.add(GROUP_EXECUTE)
    if ((m & 0x004) != 0) set.add(OTHERS_READ)
    if ((m & 0x002) != 0) set.add(OTHERS_WRITE)
    if ((m & 0x001) != 0) set.add(OTHERS_EXECUTE)
    Files.setPosixFilePermissions(pathToFile(p).toPath, set)
    ()
  }
}

/** The checksummed wrapper Spark actually resolves for `file://` — same as
  * stock LocalFileSystem but over [[NioRawLocalFileSystem]]. */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)
