package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** CSV malformed-row handling — the ingest-robustness contract a 100 TB
  * loader depends on: PERMISSIVE quarantines bad rows into the corrupt-record
  * column (load everything, triage later), DROPMALFORMED silently filters
  * them, FAILFAST aborts the job on first contact. Pinned here so a Spark
  * upgrade changing parser behavior fails loudly. */
class CsvModesSpec extends AnyFunSuite with SparkFixture {
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.types._

  private lazy val csvDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_modes")
    val f = dir.resolve("rows.csv")
    // row 3 has a type mismatch (string where INT expected) — the canonical
    // malformed shape (missing trailing columns are nulls, not malformed)
    java.nio.file.Files.writeString(f,
      """id,qty
        |1,10
        |2,20
        |3,not_a_number
        |4,40
        |""".stripMargin)
    dir.toString
  }

  private val dataSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = true),
    StructField("qty", IntegerType, nullable = true)))

  test("PERMISSIVE keeps every row and quarantines the malformed one") {
    import spark.implicits._
    val withCorrupt = dataSchema.add(StructField("_corrupt_record", StringType, nullable = true))
    val df = spark.read
      .option("header", "true").option("mode", "PERMISSIVE")
      .schema(withCorrupt).csv(csvDir)
      .cache() // corrupt-record column requires the parsed+raw rows together
    assert(df.count() === 4)
    val bad = df.filter($"_corrupt_record".isNotNull).collect()
    assert(bad.length === 1)
    assert(bad.head.getAs[String]("_corrupt_record").contains("not_a_number"))
    assert(bad.head.isNullAt(bad.head.fieldIndex("qty")), "mismatched cell must be null")
    assert(df.filter($"_corrupt_record".isNull).count() === 3)
    df.unpersist()
  }

  test("DROPMALFORMED silently drops the malformed row") {
    val df = spark.read
      .option("header", "true").option("mode", "DROPMALFORMED")
      .schema(dataSchema).csv(csvDir)
    assert(df.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 4))
  }

  test("FAILFAST aborts on the malformed row") {
    val df = spark.read
      .option("header", "true").option("mode", "FAILFAST")
      .schema(dataSchema).csv(csvDir)
    val e = intercept[org.apache.spark.SparkException](df.collect())
    assert(e.getMessage.contains("FAILFAST") || e.getMessage.contains("Malformed")
      || Option(e.getCause).exists(_.getMessage.contains("Malformed")))
  }
}
