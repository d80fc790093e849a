package graft.dml

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** How a [[VersionedTable]] manifest is PUBLISHED — the
  * commit-atomicity seam of the MVCC log.
  *
  * The whole concurrency story of the versioned table rests on ONE
  * primitive: "create this manifest iff it does not exist, atomically".
  * HDFS and POSIX filesystems provide it natively
  * (create-no-overwrite); S3-class object stores historically do NOT —
  * a plain S3A `create(path, overwrite=false)` is implemented as
  * exists-check-then-PUT, so two writers racing to publish the same
  * next version can BOTH "succeed" and one commit is silently lost.
  * The reference treats cloud storage as its own subsystem for exactly
  * this reason (`storage-manager/src/CloudStorage.cpp`,
  * `IOCoordinator.cpp` open/journal locking, metadata journaling in
  * `storage-manager/src/Synchronizer.cpp`); here the same concern is
  * isolated behind this trait:
  *
  *  - [[CommitArbiter.CreateExclusive]] — the default, used ONLY on
  *    schemes where Hadoop's create-exclusive is known atomic
  *    (local/HDFS family). On any other scheme [[VersionedTable]]
  *    REFUSES to open with an actionable message rather than running
  *    with a silently-unsound commit.
  *  - [[CommitArbiter.ConditionalPut]] — the object-store path: the
  *    deployment wires the store's conditional write (S3
  *    `If-None-Match: *` conditional PUT, GCS
  *    `x-goog-if-generation-match: 0`, ABFS ETag preconditions) into
  *    `putIfAbsent`; the arbiter then carries the same
  *    exactly-one-winner guarantee on stores whose `create()` is not
  *    atomic. DmlObjectStoreSpec proves the race on a simulated
  *    non-atomic filesystem and that this arbiter detects it.
  */
trait CommitArbiter {

  /** Atomically publish `bytes` at `path` iff nothing exists there.
    *
    * @return true if THIS call created the file (the commit won);
    *         false if the path already existed (the commit lost the
    *         race and must surface [[ConcurrentWriteException]]).
    *         Genuine IO failures (permissions, disk full) must THROW,
    *         never return false — a lost race is retryable, a broken
    *         store is not. */
  def publish(fs: FileSystem, path: HPath, bytes: Array[Byte]): Boolean
}

object CommitArbiter {

  /** Schemes whose Hadoop `create(path, overwrite = false)` is an
    * atomic create-exclusive: local/POSIX (O_CREAT|O_EXCL), the HDFS
    * family (namenode-serialized create). Deliberately conservative —
    * `s3a`/`s3`/`s3n`/`gs`/`wasb`/`abfs` are absent even where newer
    * store APIs could support preconditions, because the Hadoop
    * connector's plain create() does not promise them; those stores
    * go through [[ConditionalPut]] wired to the store's own
    * conditional-write primitive. */
  val atomicCreateSchemes: Set[String] =
    Set("file", "local", "hdfs", "viewfs", "webhdfs", "swebhdfs")

  /** Default arbiter: filesystem create-exclusive. Sound exactly on
    * [[atomicCreateSchemes]]; [[VersionedTable]] never selects it for
    * anything else. */
  object CreateExclusive extends CommitArbiter {
    def publish(fs: FileSystem, path: HPath, bytes: Array[Byte]): Boolean = {
      val out =
        try fs.create(path, /* overwrite = */ false)
        catch {
          case e: java.io.IOException =>
            // Hadoop signals an existing file as FileAlreadyExists or a
            // bare IOException depending on the FS; disambiguate a lost
            // race (path now exists → retryable) from a broken store
            if (fs.exists(path)) return false else throw e
        }
      try out.write(bytes) finally out.close()
      true
    }
  }

  /** Object-store arbiter: delegates the atomicity to the store's
    * conditional-write primitive. `putIfAbsent(fs, path, bytes)` must
    * return true iff it created the object, false iff the object
    * already existed (HTTP 412 on a conditional PUT), and throw on
    * genuine failures — the same contract as [[publish]]. */
  final class ConditionalPut(
      putIfAbsent: (FileSystem, HPath, Array[Byte]) => Boolean)
    extends CommitArbiter {
    def publish(fs: FileSystem, path: HPath, bytes: Array[Byte]): Boolean =
      putIfAbsent(fs, path, bytes)
  }

  /** Arbiter for `scheme`, or None when the store needs an explicit
    * [[ConditionalPut]] (the caller turns None into a refusal that
    * names the fix). */
  def forScheme(scheme: String): Option[CommitArbiter] =
    if (atomicCreateSchemes.contains(scheme)) Some(CreateExclusive) else None
}
