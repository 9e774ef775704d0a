package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/**
 * The PUBLISH seam of the snapshot commit protocol (VERDICT r3 #5): how a fully
 * staged+verified bucket directory and a rewritten manifest become visible. The
 * protocol around it (staging write -> re-read metrics -> verify -> publish ->
 * distributed hash -> manifest republish, [[SnapshotSink]]) is storage-agnostic; only
 * these two operations depend on what the underlying store can do atomically.
 *
 * Implementations:
 *
 *  - [[PosixCommitIo]] (default): atomic RENAME for both operations — correct on any
 *    POSIX filesystem and on HDFS, where directory rename is atomic.
 *
 *  - Object stores (S3 et al.) have NO atomic rename — a copy+delete "rename" can be
 *    observed half-done. The correct strategy there is Iceberg's metadata-pointer
 *    swap: data files are written ONCE under unique names (never renamed; `publishDir`
 *    becomes a no-op because the staging location IS the final location, recorded in
 *    the manifest), and the only atomic step is republishing the small manifest
 *    object — via put-if-absent/ETag-conditional put, or a pointer object naming the
 *    current manifest version. [[SnapshotSink]] already has the right shape for this:
 *    readers resolve data files THROUGH the manifest (`files` per bucket), and the
 *    manifest republish after every wave is exactly the pointer swap. An
 *    `ObjectStoreCommitIo` would implement `publishFile` with a conditional put and
 *    leave `publishDir` as identity bookkeeping.
 */
trait CommitIo {
  /** Make a staged bucket DIRECTORY visible at its final path. Must be atomic with
    * respect to readers: they see the whole directory or none of it. */
  def publishDir(src: Path, dst: Path): Unit

  /** Replace the manifest at `dst` with the fully-written temp file `tmp`. Must be
    * atomic with respect to readers: they see the old or the new manifest, never a
    * prefix. This is the commit point of every wave. */
  def publishFile(tmp: Path, dst: Path): Unit
}

/** Atomic-rename implementation for POSIX filesystems and HDFS — the reference's own
  * durable-write pattern (languages.py:174-175) applied to directories and metadata. */
object PosixCommitIo extends CommitIo {
  override def publishDir(src: Path, dst: Path): Unit =
    Files.move(src, dst, StandardCopyOption.ATOMIC_MOVE)

  override def publishFile(tmp: Path, dst: Path): Unit =
    Files.move(tmp, dst,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
}
