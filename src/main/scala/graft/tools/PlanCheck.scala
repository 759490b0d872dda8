package graft.tools

import org.apache.spark.sql.SparkSession

/** Builder-side plan inspector: prints the physical-plan lines matching a
  * pattern for the named catalog queries. Not part of the driver contract. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pat = sys.env.getOrElse("PLANCHECK_GREP", "Window|Limit")
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
      println(s"== $name ==")
      println(df.queryExecution.sparkPlan.toString.split("\n")
        .filter(_.matches(s".*($pat).*")).mkString("\n"))
    }
    spark.stop()
  }
}
