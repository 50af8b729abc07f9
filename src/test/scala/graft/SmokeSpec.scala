package graft

/** Execution smoke over the ENTIRE gate registry at sf0.001: every
  * query must EXECUTE (the PlanSpec sweep only plans). Catches
  * runtime-only failures — codegen errors, fixture-cache issues,
  * expression eval bugs on the smallest data — in one suite-wide
  * guard instead of at driver time. Row counts are not asserted
  * (several gates are legitimately empty at sf0.001); throwing is
  * the only failure. */
class SmokeSpec extends SparkSuite {

  test("every registered gate executes at sf0.001") {
    val failures = SparkEntry.specs.flatMap { q =>
      try {
        q.fn(spark, sf0001).queryExecution.toRdd.count()
        None
      } catch {
        // NonFatal only: an OOM/LinkageError means the JVM is
        // compromised — abort the suite instead of cascading 180
        // bogus failures
        case scala.util.control.NonFatal(e) => Some(s"${q.name}: $e")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
