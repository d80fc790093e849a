package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared session base for the specs: one local session, smallest
  * scale factor, same engine config as the library surface. */
abstract class SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
  val sfDir = "/root/testdata/sf0.001"

  override def afterAll(): Unit = {
    // keep the shared session alive across suites (getOrCreate)
  }
}
