package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards against silent Map-literal key shadowing in the battery sources.
  *
  * Scala `Map("k" -> …, "k" -> …)` keeps the LAST duplicate without warning —
  * exactly how the occupancy-scaled d_semantic_dedup entry was once shadowed
  * by a fixed-k rewrite of the same name (benched at 950 s instead of 60 s at
  * sf10 before the duplicate was found). The runtime Map can't reveal this
  * (it has already dropped the loser), so this spec scans the SOURCE for
  * entry-lambda keys and requires each literal to appear exactly once.
  */
class QueryKeySpec extends AnyFunSuite {

  private val entryKey = """"([a-z][a-z0-9_]*)"\s*->\s*\(\(s, d\)""".r
  // oracle entries map a name to a string literal ("..." or [s]"""...),
  // possibly with // comment lines between the arrow and the literal
  private val oracleKey =
    """"([a-z][a-z0-9_]*)"\s*->(?:\s|//[^\n]*)*(?:s?\"\"\"|\")""".r

  private def scan(re: scala.util.matching.Regex): Seq[String] = {
    val files = Seq(
      "src/main/scala/graft/Queries.scala",
      "src/main/scala/graft/QueriesData.scala")
    files.flatMap { f =>
      val src = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(f)), java.nio.charset.StandardCharsets.UTF_8)
      re.findAllMatchIn(src).map(_.group(1)).toSeq
    }
  }

  test("battery entry keys are unique across the query source files") {
    val keys = scan(entryKey)
    val dups = keys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty,
      s"duplicate battery entry keys (later silently wins): ${dups.mkString(", ")}")
    // sanity: the scan actually sees the battery (names drift → regex rots)
    assert(keys.size >= 90, s"entry-key scan found only ${keys.size} keys")
    assert(keys.contains("d_semantic_dedup") && keys.contains("d_semantic_prune"))
  }

  test("oracle keys are unique too (same silent-shadowing trap, SQL side)") {
    val keys = scan(oracleKey)
    val dups = keys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dups.isEmpty,
      s"duplicate oracle keys (later silently wins): ${dups.mkString(", ")}")
    assert(keys.size >= 80, s"oracle-key scan found only ${keys.size} keys")
    assert(keys.contains("d_url_dedup") && keys.contains("q5_region_revenue"))
  }

  test("every oracle key has a matching query entry") {
    val stray = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stray.isEmpty, s"oracles with no query entry: ${stray.mkString(", ")}")
  }
}
