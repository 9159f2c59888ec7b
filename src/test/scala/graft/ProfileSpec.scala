package graft

import graft.text.Profile

class ProfileSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("approx profile tracks the exact one within sketch tolerance") {
    val e = Profile.exact(docs).collect().map(r => r.getString(0) -> r).toMap
    val a = Profile.approx(docs).collect().map(r => r.getString(0) -> r).toMap
    assert(e.keySet == a.keySet)
    e.foreach { case (src, er) =>
      val ar = a(src)
      assert(ar.getLong(1) == er.getLong(1), "n_docs is exact in both")
      assert(ar.getLong(5) == er.getLong(5), "total_chars is exact in both")
      // HLL++ rsd default 5%: allow 10% on the small per-source fixtures
      val (eu, au) = (er.getLong(2).toDouble, ar.getLong(2).toDouble)
      assert(math.abs(au - eu) / eu <= 0.10, s"$src n_unique: exact=$eu approx=$au")
      // GK percentile_approx returns a REAL element, exact interpolates
      // between order stats — on sf0.01's ~25-doc sources one element step
      // is up to ~8% of the value, so the bound is the FIXTURE's adjacent
      // order-stat gap, not sketch error (which is ~0 at this accuracy)
      assert(math.abs(ar.getDouble(3) - er.getDouble(3)) / er.getDouble(3) <= 0.10,
        s"$src p50: exact=${er.getDouble(3)} approx=${ar.getDouble(3)}")
      assert(math.abs(ar.getDouble(4) - er.getDouble(4)) / er.getDouble(4) <= 0.10,
        s"$src p90: exact=${er.getDouble(4)} approx=${ar.getDouble(4)}")
      assert(ar.getDouble(6) == er.getDouble(6), "avg_tokens identical (same sum/count)")
    }
  }

  test("both profiles are single-shuffle with map-side partials (sketch state moves, not rows)") {
    for (df <- Seq(Profile.exact(docs), Profile.approx(docs))) {
      val p = df.queryExecution.executedPlan.toString
      // exact count-distinct plans a two-phase expand (2 exchanges);
      // the approx form must stay at ONE exchange of sketch partials
      assert(p.contains("partial"), s"no partial aggregation:\n${p.take(1500)}")
    }
    val ap = Profile.approx(docs).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(ap).size
    assert(exchanges == 1,
      s"approx profile must be a single sketch-state shuffle, got $exchanges:\n$ap")
  }

  test("topTerms: frequency order, lexicographic tiebreak, map-side group limit") {
    import spark.implicits._
    val f = Seq(
      (1L, "b b b A a c", "s1"), (2L, "a d", "s1"),
      (3L, "z z", "s2"), (4L, null.asInstanceOf[String], "s2")
    ).toDF("doc_id", "text", "source")
    val out = Profile.topTerms(f, k = 2)
    val got = out.orderBy("source", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    // s1: a=3 (case-folded) ties b=3 → 'a' first lexicographically; null text contributes nothing
    assert(got.toSeq == Seq(("s1", "a", 3L, 1), ("s1", "b", 3L, 2),
      ("s2", "z", 2L, 1)), got.mkString(", "))
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("WindowGroupLimit"), s"top-k not pushed map-side:\n$p")
    assert(p.contains("partial_count"), "term count must partial-aggregate")
  }

  test("null and empty text: profiled, not dropped") {
    import spark.implicits._
    val f = Seq((1L, "a b", "s1", 3L), (2L, null.asInstanceOf[String], "s1", 0L),
      (3L, "", "s1", 0L)).toDF("doc_id", "text", "source", "n_chars")
    val r = Profile.exact(f).collect().head
    assert(r.getLong(1) == 3L, "all docs counted")
    assert(r.getLong(2) == 2L, "null digest ignored by distinct; '' and 'a b' distinct")
    assert(r.getDouble(6) == 1.0, "avg over non-null texts: (2 + 0) / 2")
  }
}
