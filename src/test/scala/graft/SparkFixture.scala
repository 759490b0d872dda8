package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession across all suites (getOrCreate → the same
  * session is reused; SURVEY.md §5.2). sf0.001 is the smoke tier. */
trait SparkFixture {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse") // managed tables (bucketing spec)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
