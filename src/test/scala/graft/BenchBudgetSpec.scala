package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's per-family budget gate, tested as the pure function it
  * is (the env-gated wiring in [[Bench.main]] just feeds it): an
  * intentional regression must surface as a violation, in-budget
  * families must not, and unknown families in the budget spec are
  * ignored rather than trip.
  */
class BenchBudgetSpec extends AnyFunSuite {

  test("intentional regression trips its family; others stay quiet") {
    val measured = Map("dedup" -> 90.0, "ann" -> 5.0, "text" -> 0.9)
    val got = Bench.budgetViolations(measured, Bench.DefaultBudgets)
    assert(got.size == 1, got.toString)
    assert(got.head.contains("'dedup'") && got.head.contains("90.00"),
      got.head)
  }

  test("in-budget run has no violations") {
    val measured = Bench.DefaultBudgets.map { case (f, b) => f -> b * 0.6 }
    assert(Bench.budgetViolations(measured, Bench.DefaultBudgets).isEmpty)
  }

  test("budget for a family the run did not measure is ignored") {
    assert(Bench.budgetViolations(Map("ann" -> 1.0),
      Map("ann" -> 2.0, "nosuch" -> 1.0)).isEmpty)
  }
}
