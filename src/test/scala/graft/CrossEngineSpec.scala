package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import graft.sources.CrossEngine

/** CrossEngineStep analog against an embedded Derby instance (the
  * same JVM-local JDBC shape as the reference's MySQL-protocol
  * foreign reads): foreign rows participate in joins with columnar
  * tables, and the partitioned read path splits the fetch. */
class CrossEngineSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftx;create=true"

  override def beforeAll(): Unit = {
    super.beforeAll()
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute("CREATE TABLE region_meta (r_regionkey INT, votes INT)")
    (0 until 5).foreach(k => st.execute(s"INSERT INTO region_meta VALUES ($k, ${k * 10 + 1})"))
    st.close(); c.close()
  }

  test("foreign JDBC table joins against a columnar table") {
    val foreign = CrossEngine.table(spark, url, "region_meta", user = "", password = "")
      .toDF("f_regionkey", "votes")
    val joined = Tables.t(spark, sfDir, "region")
      .join(foreign, col("r_regionkey") === col("f_regionkey"))
      .select(col("r_name"), col("votes"))
      .orderBy(col("r_name"))
      .collect()
    assert(joined.length == 5)
    assert(joined.map(_.getInt(1)).sum == (0 until 5).map(_ * 10 + 1).sum)
  }

  test("partitioned foreign read splits the fetch") {
    val foreign = CrossEngine.table(spark, url, "region_meta", user = "", password = "",
      partitionColumn = Some("r_regionkey"), lowerBound = 0, upperBound = 5, numPartitions = 3)
    assert(foreign.rdd.getNumPartitions == 3)
    assert(foreign.count() == 5)
  }
}
