package graft.sources

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Session-scoped scratch storage, resolved through the Hadoop
  * FileSystem API so staged intermediates are visible to EVERY
  * executor — the shared-storage role the reference routes through
  * its storage manager (`storage-manager/src/IOCoordinator.cpp`,
  * `CloudStorage.cpp`): on a real cluster a driver-local
  * `java.nio.file` temp dir is invisible to executor tasks, so any
  * stage-then-read-back pattern silently loses data off single-node.
  *
  * Root resolution order:
  *  1. `spark.graft.scratchRoot` (set it to `hdfs://...`/`s3a://...`
  *     on a cluster);
  *  2. `<spark.sql.warehouse.dir>/_graft_scratch` — the warehouse is
  *     the one location Spark already requires to be shared.
  *
  * One static JVM shutdown hook reclaims every directory allocated
  * through `newDir` (a per-call hook would accumulate without bound
  * in a long-lived service); `remove` reclaims eagerly when the
  * caller knows the staged data is no longer referenced.
  */
object Scratch {
  val ConfKey = "spark.graft.scratchRoot"

  /** The qualified scratch root (created on first use). */
  def root(spark: SparkSession): HPath = {
    val raw = spark.conf.getOption(ConfKey)
      .getOrElse(spark.conf.get("spark.sql.warehouse.dir") + "/_graft_scratch")
    val p = new HPath(raw)
    p.getFileSystem(hadoopConf(spark)).makeQualified(p)
  }

  def hadoopConf(spark: SparkSession): Configuration =
    spark.sparkContext.hadoopConfiguration

  /** FileSystem serving `p` under this session's Hadoop config. */
  def fs(spark: SparkSession, p: HPath): FileSystem =
    p.getFileSystem(hadoopConf(spark))

  // every dir allocated this JVM, reclaimed by the single hook below
  private val live = ConcurrentHashMap.newKeySet[String]()
  private val hookArmed = new AtomicBoolean(false)
  @volatile private var hookConf: Configuration = _

  /** Allocate a fresh scratch directory `<root>/<prefix>-<uuid8>` and
    * return its qualified path string (usable by spark.read/write on
    * any FS scheme). Tracked for end-of-JVM reclamation. */
  def newDir(spark: SparkSession, prefix: String): String = {
    val r = root(spark)
    val dir = new HPath(r, s"$prefix-${UUID.randomUUID().toString.take(8)}")
    val f = fs(spark, dir)
    f.mkdirs(dir)
    if (hookArmed.compareAndSet(false, true)) {
      hookConf = hadoopConf(spark)
      sys.addShutdownHook {
        import scala.jdk.CollectionConverters._
        live.asScala.toSeq.foreach { d =>
          try {
            val p = new HPath(d)
            p.getFileSystem(hookConf).delete(p, true)
          } catch { case _: Throwable => () } // best-effort at exit
        }
      }
    }
    live.add(dir.toString)
    dir.toString
  }

  /** Eagerly delete a scratch dir allocated by `newDir`. */
  def remove(spark: SparkSession, dir: String): Unit = {
    val p = new HPath(dir)
    fs(spark, p).delete(p, true)
    live.remove(dir)
  }
}
