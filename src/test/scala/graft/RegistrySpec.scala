package graft

/** Registry-wide invariants: unique names, oracle coverage, and — cheap but
  * high-value — every query must pass ANALYSIS against the real fixture
  * schemas (catches column typos / type errors without executing). */
class RegistrySpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("names are unique and well-formed") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(names.forall(_.matches("[a-z0-9_]+")))
  }

  test("every query analyzes against sf0.001 schemas") {
    Registry.all.foreach { q =>
      val schema = q.fn(spark, sfDir).schema // analysis only, no execution
      assert(schema.nonEmpty, s"${q.name} produced empty schema")
      assert(schema.fieldNames.toSeq.distinct.size == schema.size,
        s"${q.name} has duplicate column names")
    }
  }

  test("oracle SQL exists for every query (full differential coverage)") {
    // Sketch aggregates are engine-specific by design -> rows-only check;
    // everything else must carry an oracle.
    val allowedRowsOnly = Set("q31_approx_sketches")
    val missing = Registry.all.filter(_.oracle.isEmpty).map(_.name).filterNot(allowedRowsOnly)
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("driver contract: entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
