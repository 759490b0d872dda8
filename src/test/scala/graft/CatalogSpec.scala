package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-wide invariants: every declared query runs at the smoke tier and
  * every oracle'd query keeps the contract that makes the driver's DuckDB
  * hash-compare meaningful (deterministic output, matching column names). */
class CatalogSpec extends AnyFunSuite with SparkFixture {

  test("catalog names are unique and well-formed") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size === names.size)
    assert(names.forall(_.matches("[a-z0-9_]+")))
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (q <- SparkEntry.catalog) {
    test(s"${q.name} runs at sf0.001 and is deterministic across two runs") {
      val a = q.fn(spark, sf)
      val b = q.fn(spark, sf)
      assert(a.schema.fieldNames.nonEmpty)
      val ra = a.collect().toSeq
      val rb = b.collect().toSeq
      assert(ra === rb, s"${q.name} not reproducible")
    }
  }
}
