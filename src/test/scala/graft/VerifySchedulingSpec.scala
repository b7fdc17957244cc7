package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Verify's gate-scheduling partition. The pool runs gates
  * concurrently, so the names in the sequential-only set are a
  * CORRECTNESS boundary: a gate that mutates session conf, asserts on
  * a process-global evidence hook, or needs a zero-delta window on the
  * global footerReads counter must never join the pool. The spec
  * catches the silent failure mode — a gate rename that makes a
  * sequential-only name stop matching anything, dropping that gate
  * into the pool.
  */
class VerifySchedulingSpec extends AnyFunSuite {
  test("every sequential-only gate name exists in SparkEntry.queries") {
    val all = SparkEntry.queries.keySet
    val missing = Verify.sequentialOnly.filterNot(all)
    assert(missing.isEmpty,
      s"sequential-only names no longer match any gate: $missing")
  }

  test("the SqlDml pool-safe allowlist names existing SqlDml gates only") {
    val dml = graft.queries.SqlDmlQueries.all.map(_._1).toSet
    val stale = Verify.sqlDmlPoolSafe.filterNot(dml)
    assert(stale.isEmpty,
      s"pool-safe names no longer match a SqlDml gate: $stale")
  }

  test("the known conf-mutating and counter-window gates are sequential") {
    // conf mutators (CBO flags / broadcast threshold) and the gates
    // asserting zero-delta windows on SkippingIndex.footerReads
    val mustBeSequential = Set(
      "s65_log_cbo", "s68_cbo_histogram", "s70_string_skew",
      "c13_cbo_bhj", "s24_log_stats_prune", "s31_mixed_box",
      "s32_string_in_prune", "s35_metadata_agg")
    val missing = mustBeSequential.filterNot(Verify.sequentialOnly)
    assert(missing.isEmpty,
      s"gates with cross-gate shared state left the sequential set: $missing")
  }
}
