package graft

import graft.SparkSpec

/** Driver-contract invariants: the smoke-checked flagship returns rows,
  * and every query has a matching oracle (the driver records a weaker
  * rows-only check for any key missing from oracleSql — there should be
  * none). */
class SparkEntrySpec extends SparkSpec {

  test("entry flagship returns rows on sf0.001") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every query is oracle-gated and keys line up exactly") {
    SparkEntry.queries.keySet shouldBe SparkEntry.oracleSql.keySet
    SparkEntry.queries.size shouldBe SparkEntry.oracleSql.size
    SparkEntry.queries.size should be >= 299
  }
}
