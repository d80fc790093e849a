package graft.sources

import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cross-engine table access — the CrossEngineStep analog
  * (`dbcon/joblist/crossenginestep.h:53`, `crossenginestep.cpp`: the
  * reference reads non-ColumnStore tables over the MySQL client
  * protocol so they can join against columnar tables).
  *
  * On Spark this is configuration, not an operator: `spark.read.jdbc`
  * produces a DataFrame that participates in any join/agg like a
  * native table, with predicate pushdown into the remote engine and
  * optional split reads for parallelism. This wrapper pins the
  * defaults that matter at scale:
  *  - `partitionColumn`/bounds → N parallel connections instead of a
  *    single-threaded fetch (the reference's CrossEngineStep is
  *    single-streamed — this is strictly better);
  *  - `pushDownPredicate` stays on so remote filters prune early;
  *  - `fetchsize` batches the wire protocol.
  *
  * Untestable in this zero-egress environment (no reachable JDBC
  * endpoint) — exercised in deployments; kept thin on purpose.
  */
object CrossEngine {

  def table(
      spark: SparkSession,
      url: String,
      table: String,
      user: String,
      password: String,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L,
      upperBound: Long = 1L,
      numPartitions: Int = 8,
      fetchSize: Int = 10000): DataFrame = {
    val props = new Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("fetchsize", fetchSize.toString)
    partitionColumn match {
      case Some(c) =>
        spark.read.jdbc(url, table, c, lowerBound, upperBound, numPartitions, props)
      case None =>
        spark.read.jdbc(url, table, props)
    }
  }
}
