package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: the flagship entry returns rows at sf0.001 and
  * every oracle key has a matching query. */
class EntrySpec extends AnyFunSuite {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(TestSpark.spark).count() > 0)
  }

  test("oracle keys are a subset of query keys") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    assert(q.size >= 35)
  }

  test("every query runs at sf0.001 and yields rows") {
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        if (fn(TestSpark.spark, "/root/testdata/sf0.001").count() > 0) None
        else Some(s"$name: 0 rows")
      } catch { case e: Exception => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
