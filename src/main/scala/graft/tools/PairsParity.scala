package graft.llm

import org.apache.spark.sql.SparkSession

/** Builder-side check: sketch-then-verify LSH pairs vs the exact capped
  * inverted index, per SF dir. Prints counts and the symmetric difference
  * size — must be 0 for the capstone oracles to stay exact. */
object PairsParity {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      val docs = graft.sources.Tables.documents(spark, dir)
      val exact = Dedup.neardupPairs(docs)
        .select("doc_a", "doc_b")
      val lshv = Dedup.neardupPairsLshVerified(docs)
        .select("doc_a", "doc_b")
      val onlyExact = exact.exceptAll(lshv).count()
      val onlyLsh = lshv.exceptAll(exact).count()
      println(s"$dir exact=${exact.count()} lshVerified=${lshv.count()} " +
        s"onlyExact=$onlyExact onlyLsh=$onlyLsh")
    }
    spark.stop()
  }
}
