package graft

/** A FilterFileSystem that throws after `failAt` MUTATING ops (create /
  * rename / delete — the crash-shaped operations; reads can't corrupt).
  * failAt = MaxValue counts a clean run's op total. Shared by the
  * Store-swap and StateStore-fold fault grids: both protocols claim
  * exactly-once content from EVERY interruption point, and this is the
  * filesystem that proves it.
  */
private[graft] class FaultFs(underlying: org.apache.hadoop.fs.FileSystem,
                             failAt: Int)
    extends org.apache.hadoop.fs.FilterFileSystem(underlying) {
  var ops = 0
  private def tick(): Unit = {
    ops += 1
    if (ops >= failAt) throw new java.io.IOException(
      s"injected fault at mutating op $ops")
  }
  override def create(f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream = {
    tick(); super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress)
  }
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean = {
    tick(); super.rename(src, dst)
  }
  override def delete(f: org.apache.hadoop.fs.Path,
                      recursive: Boolean): Boolean = {
    tick(); super.delete(f, recursive)
  }
}
