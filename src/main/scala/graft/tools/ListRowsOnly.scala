package graft.tools

/** Builder-side: list catalog entries without a DuckDB oracle. */
object ListRowsOnly {
  def main(args: Array[String]): Unit =
    graft.SparkEntry.catalog.filter(_.oracle.isEmpty).map(_.name).sorted
      .foreach(println)
}
