package graft

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import graft.dml.{CommitArbiter, ConcurrentWriteException, VersionedTable}

/** Child JVM for [[DmlCrossProcessSpec]]: opens the shared table,
  * stages one insert in a transaction PINNED to the base version it
  * observed, then parks on a filesystem barrier until every racer is
  * staged — so two separate PROCESSES commit against the same base at
  * the same moment, the collision the reference's DBRM serializes
  * across processes (`versioning/BRM/` distributed lock manager; the
  * in-JVM DmlSpec/DmlObjectStoreSpec races cover threads only).
  *
  * Protocol (all via files under syncDir, no sockets):
  *  - stage tx, touch `ready-<label>`
  *  - wait for `go`
  *  - commit: winner prints `WON v=<n>`; a loser prints `LOST`,
  *    re-begins from the new base and prints `RETRY-WON v=<n>`
  *  - exit 0 on success, 2 on timeout/failure
  *
  * Modes:
  *  - `local`  — file:// table, default create-exclusive arbiter
  *    (cross-process O_CREAT|O_EXCL at the kernel)
  *  - `racylock` — racy:// table (non-atomic create) + a
  *    ConditionalPut whose claim is an atomic lock-file create in a
  *    shared directory: the conditional-write analog where the
  *    atomicity lives OUTSIDE the data filesystem, valid across
  *    processes.
  */
object RaceChildMain {

  /** Cross-process conditional-put: claim `<lockDir>/<manifest-name>`
    * with java.nio createFile (O_EXCL — atomic across processes),
    * then write the manifest through the (non-atomic) FS. Shared by
    * the spec's parent (table create) and both children. */
  def lockArbiter(lockDir: String): CommitArbiter =
    new CommitArbiter.ConditionalPut((fs: FileSystem, p: HPath, bytes: Array[Byte]) => {
      val lock = java.nio.file.Paths.get(lockDir, p.getName)
      java.nio.file.Files.createDirectories(lock.getParent)
      val claimed =
        try { java.nio.file.Files.createFile(lock); true }
        catch { case _: java.nio.file.FileAlreadyExistsException => false }
      if (!claimed) false
      else {
        val out = fs.create(p, true)
        try out.write(bytes) finally out.close()
        true
      }
    })

  def main(args: Array[String]): Unit = {
    val Array(mode, tableDir, syncDir, label) = args
    val deadline = System.currentTimeMillis() + 120000L
    def await(name: String): Unit = {
      val p = java.nio.file.Paths.get(syncDir, name)
      while (!java.nio.file.Files.exists(p)) {
        if (System.currentTimeMillis() > deadline) {
          println(s"TIMEOUT waiting for $name"); sys.exit(2)
        }
        Thread.sleep(50)
      }
    }
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName(s"race-child-$label")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      if (mode == "racylock")
        spark.sparkContext.hadoopConfiguration
          .set("fs.racy.impl", classOf[RacyFileSystem].getName)
      val arbiter = mode match {
        case "local" => None
        case "racylock" => Some(lockArbiter(s"$tableDir/_locks"))
        case other => println(s"unknown mode $other"); sys.exit(2); None
      }
      val loc = if (mode == "racylock") s"racy://$tableDir" else s"file:$tableDir"
      val t = VersionedTable.open(spark, loc, arbiter = arbiter)
      import spark.implicits._
      val tx = t.begin() // pins the base BOTH children observed
      tx.insert(Seq((label.hashCode.toLong, label)).toDF("id", "v"))
      java.nio.file.Files.createFile(
        java.nio.file.Paths.get(syncDir, s"ready-$label"))
      await("go")
      try println(s"WON v=${tx.commit()}")
      catch {
        case _: ConcurrentWriteException =>
          println("LOST")
          // clean loser retry: re-observe, re-apply, re-commit
          var committed = -1
          var attempts = 0
          while (committed < 0 && attempts < 5) {
            attempts += 1
            val tx2 = t.begin()
            tx2.insert(Seq((label.hashCode.toLong, label)).toDF("id", "v"))
            try committed = tx2.commit()
            catch { case _: ConcurrentWriteException => }
          }
          if (committed < 0) { println("RETRY-FAILED"); sys.exit(2) }
          println(s"RETRY-WON v=$committed")
      }
    } finally spark.stop()
    sys.exit(0)
  }
}
