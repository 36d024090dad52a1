package graft

class SparkEntrySpec extends SparkSpec {

  test("query registry is well-formed") {
    assert(SparkEntry.defs.nonEmpty)
    // every oracle key has a query
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("entry flagship runs on sf0.001 with rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs on sf0.001") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try { fn(spark, "/root/testdata/sf0.001").count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
