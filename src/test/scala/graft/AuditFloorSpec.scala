package graft

import org.scalatest.funsuite.AnyFunSuite

/** Floor ENFORCEMENT at verify time (r10 verdict task 2): the audit-row
  * function must flag a measured value below its floor — and an empty
  * result that leaves a configured floor undemonstrated — as a FAILURE
  * (Verify then withholds the entry's dump so the driver's compare records
  * an error row), while the healthy / gated / floorless shapes stay green.
  */
class AuditFloorSpec extends AnyFunSuite {

  test("measured value below an injected floor fails; at-or-above passes") {
    val (below, failBelow) =
      Verify.auditRow("recall_at_k", Some(Some(0.2)), Some(0.35))
    assert(failBelow, "a below-floor measurement must fail the entry")
    assert(below.contains("\"above_floor\":false") &&
      below.contains("\"enforced\":true"), below)
    val (at, failAt) =
      Verify.auditRow("recall_at_k", Some(Some(0.35)), Some(0.35))
    assert(!failAt && at.contains("\"above_floor\":true"), at)
    val (above, failAbove) =
      Verify.auditRow("recall_at_k", Some(Some(0.96)), Some(0.5))
    assert(!failAbove && above.contains("\"above_floor\":true"), above)
  }

  test("gated (null-cell) audits never fail — the floor is not demonstrable in the operator-only regime") {
    val (row, fail) = Verify.auditRow("exact_pair_recall", Some(None),
      Some(0.35))
    assert(!fail)
    assert(row.contains("\"gated\":true") && row.contains("\"value\":null"),
      row)
  }

  test("empty result: fails when a floor is configured, records-only when not") {
    val (row, fail) = Verify.auditRow("recall_at_k", None, Some(0.5))
    assert(fail, "an empty result cannot demonstrate its floor")
    assert(row.contains("\"empty_result\":true") &&
      row.contains("\"above_floor\":false"), row)
    val (row2, fail2) = Verify.auditRow("holdout_acc", None, None)
    assert(!fail2 && row2.contains("\"empty_result\":true"), row2)
  }

  test("no floor configured: any measured value passes (recorded, vacuous-true)") {
    val (row, fail) = Verify.auditRow("holdout_acc", Some(Some(0.01)), None)
    assert(!fail && row.contains("\"floor\":null"), row)
  }
}
