package graft

import graft.remap._

/** Mirrors the reference's offset-mapping unit fixtures (manifest.rs:909-1173,
  * FIXTURES.md §5): exact lookup, beyond-range extrapolation, range
  * interpolation, ts lookup, and the update_range(None)/add_detailed(Some)
  * regression.
  */
class OffsetMappingSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def withPairs: OffsetMapping =
    (0 until 3).foldLeft(OffsetMapping()) { (m, i) =>
      m.addDetailed("orders", 0, OffsetPair(i, 5000 + i, 1000L * (i + 1)))
    }

  test("detailed pairs: exact lookup and beyond-range delta extrapolation") {
    val m = withPairs
    assert(m.lookupTargetOffset("orders", 0, 0).contains(5000L))
    assert(m.lookupTargetOffset("orders", 0, 2).contains(5002L))
    // beyond the last pair: nearest-≤ (2→5002) + delta 997
    assert(m.lookupTargetOffset("orders", 0, 999).contains(5999L))
    // unknown topic/partition → None
    assert(m.lookupTargetOffset("nope", 0, 0).isEmpty)
    assert(m.lookupTargetOffset("orders", 7, 0).isEmpty)
  }

  test("range-only entry: linear midpoint interpolation") {
    val m = OffsetMapping()
      .add("t", 0, 0, Some(5000), 1000)
      .updateRange("t", 0, 100, Some(5100), 2000)
    assert(m.lookupTargetOffset("t", 0, 50).contains(5050L))
    assert(m.lookupTargetOffset("t", 0, 0).contains(5000L))
    assert(m.lookupTargetOffset("t", 0, 100).contains(5100L))
    // degenerate single-point range
    val single = OffsetMapping().add("s", 0, 7, Some(42), 1000)
    assert(single.lookupTargetOffset("s", 0, 7).contains(42L))
  }

  test("timestamp lookup: exact, between rounds up, after-last returns last") {
    val m = withPairs
    assert(m.nearestOffsetByTimestamp("orders", 0, 2000).contains((1L, 5001L)))
    assert(m.nearestOffsetByTimestamp("orders", 0, 1500).contains((1L, 5001L)))
    assert(m.nearestOffsetByTimestamp("orders", 0, 500).contains((0L, 5000L)))
    assert(m.nearestOffsetByTimestamp("orders", 0, 99999).contains((2L, 5002L)))
    assert(m.nearestOffsetByTimestamp("zzz", 0, 0).isEmpty)
  }

  test("update_range(None) pre-produce then targets fill without clobbering (regression)") {
    // phase 2 records source ranges before produce acks exist
    var m = OffsetMapping()
      .updateRange("t", 0, 10, None, 1000)
      .updateRange("t", 0, 99, None, 2000)
    val e0 = m.entries("t/0")
    assert(e0.source_first_offset == 10 && e0.source_last_offset == 99)
    assert(e0.target_first_offset.isEmpty && e0.target_last_offset.isEmpty)
    // produce callbacks fill targets
    m = m.updateRange("t", 0, 10, Some(7010), 1000)
      .updateRange("t", 0, 99, Some(7099), 2000)
    val e1 = m.entries("t/0")
    assert(e1.target_first_offset.contains(7010L) && e1.target_last_offset.contains(7099L))
    // a later None must NOT clobber an existing Some
    m = m.updateRange("t", 0, 5, None, 500)
    val e2 = m.entries("t/0")
    assert(e2.source_first_offset == 5)
    assert(e2.target_first_offset.contains(7010L), "None must not clobber Some")
  }

  test("recalculateTargets fills ranges from detailed pairs (J4 import)") {
    var m = OffsetMapping()
      .updateRange("t", 0, 0, None, 1000)
      .updateRange("t", 0, 100, None, 2000)
    m = m.addDetailed("t", 0, OffsetPair(0, 9000, 1000))
    m = m.recalculateTargets
    val e = m.entries("t/0")
    assert(e.target_first_offset.contains(9000L))
    assert(e.target_last_offset.contains(9100L)) // 9000 + (100-0)
  }

  test("reset plan: complete groups and exports (J3/K8)") {
    val m = withPairs
    val plan = OffsetResetPlan.build(
      Seq(("order-processor", "orders", 0, 50L), ("half-mapped", "nope", 0, 1L)), m)
    assert(plan.groupComplete("order-processor"))
    assert(!plan.groupComplete("half-mapped"))
    assert(plan.entries.head.target_offset.contains(5050L)) // 5002 + (50-2)
    assert(plan.toCsv.linesIterator.size == 3)
    assert(plan.toCsv.contains("order-processor,orders,0,50,5050"))
    assert(plan.toShellScript("k:9092").contains("--to-offset 5050"))
    assert(plan.toJson.contains("\"target_offset\":null"))
    // YAML report: grouped shape, resolved and unresolved rows both present
    val yaml = plan.toYaml
    assert(yaml.contains("- group_id: \"order-processor\""))
    assert(yaml.contains("target_offset: 5050"))
    assert(yaml.contains("target_offset: null"))
    assert(yaml.linesIterator.count(_.trim.startsWith("- topic:")) == 2)
  }

  test("reset plan JSON escapes adversarial group/topic names (K8)") {
    val plan = OffsetResetPlan(Seq(OffsetResetEntry(
      "g\"quote\\back\nline\tctrl", "t\"opic", 0, 1L, Some(2L))))
    val json = plan.toJson
    // must parse as valid JSON and round-trip the adversarial name
    val parsed = org.json4s.jackson.JsonMethods.parse(json)
    val g = (parsed \\ "group_id").values.toString
    assert(g == "g\"quote\\back\nline\tctrl")
    val t = (parsed \\ "topic").values.toString
    assert(t == "t\"opic")
  }

  test("offset rollback: snapshot, apply, verify mismatches (J9)") {
    import graft.remap.OffsetRollback
    val committed = Seq(("g1", "t", 0, 100L), ("g1", "t", 1, 200L), ("g2", "u", 0, 5L))
    val snap = OffsetRollback.snapshot(committed, "pre-reset", takenAt = 1700L)
    val dir = java.nio.file.Files.createTempDirectory("rb").toString
    OffsetRollback.save(s"$dir/snap.json", snap)
    val loaded = OffsetRollback.load(s"$dir/snap.json")
    assert(loaded == snap)
    // apply rollback through a committer
    val committer = new graft.pipelines.RecordingCommitter()
    assert(OffsetRollback.apply(loaded, committer) == 3)
    assert(committer.committed.toSet == committed.toSet)
    // verify: one drifted, one missing, one extra
    val actual = Seq(("g1", "t", 0, 100L), ("g1", "t", 1, 999L), ("g3", "v", 0, 7L))
    val mismatches = OffsetRollback.verify(snap, actual)
    assert(mismatches.toSet == Set(
      ("g1", "t", 1, Some(200L), Some(999L)),
      ("g2", "u", 0, Some(5L), None),
      ("g3", "v", 0, None, Some(7L))))
  }
}
