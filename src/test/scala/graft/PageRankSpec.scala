package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** Integer-exact PageRank: hand-computed fixtures (symmetric, dangling,
  * weighted), mass conservation, re-shard determinism, and the
  * staging ≡ localCheckpoint contract.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String, Long)],
                      staging: Option[String] = None,
                      gate: Long = 1000000L): Map[String, Long] =
    PageRank.ranks(edges.toDF("src", "dst", "w"), iterations = 10,
        stagingDir = staging, driverGateEdges = gate)
      .as[(String, Long)].collect().toMap

  test("pagerank: symmetric 2-cycle holds exactly half the mass each") {
    assert(ranksOf(Seq(("a", "b", 1L), ("b", "a", 1L))) ==
      Map("a" -> 500000000L, "b" -> 500000000L))
  }

  test("pagerank: dangling node returns its mass through the teleport") {
    // a → b, b has no out-edges; fixture iterated by hand with the same
    // round-at-every-step micro-unit arithmetic (10 iterations)
    assert(ranksOf(Seq(("a", "b", 1L))) ==
      Map("a" -> 350905864L, "b" -> 649094138L))
  }

  test("pagerank: weighted out-edges split contributions 3:1") {
    assert(ranksOf(Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 1L),
      ("c", "a", 1L))) ==
      Map("a" -> 456334551L, "b" -> 382749088L, "c" -> 160916363L))
  }

  test("pagerank: mass conserved within per-node rounding slack") {
    val edges = (0 until 40).flatMap { i =>
      Seq((s"n$i", s"n${(i * 3 + 1) % 17}", 1L + i % 3),
        (s"n$i", s"n${(i * 5 + 2) % 23}", 1L))
    }
    val r = ranksOf(edges)
    val total = r.values.sum
    assert(math.abs(total - 1000000000L) <= r.size,
      s"mass drifted: $total over ${r.size} nodes")
  }

  test("personalized: teleport mass stays on the seeds, unreachable " +
    "components hold exactly 0, hand-iterated fixture") {
    val edges = Seq(("a", "b", 1L), ("b", "a", 1L), ("c", "d", 1L))
    val out = PageRank.ranks(edges.toDF("src", "dst", "w"),
        iterations = 10, seeds = Some(Seq("a")))
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 630996348L, "b" -> 369003652L,
      "c" -> 0L, "d" -> 0L))
    assert(math.abs(out.values.sum - 1000000000L) <= out.size)
  }

  test("personalized: driver path ≡ distributed path; seed outside the " +
    "edge set joins the node set as a dangling seed") {
    val edges = (0 until 30).map { i =>
      (s"d${i % 7}", s"d${(i * 2 + 1) % 7}", 1L + i % 4)
    }
    val seeds = Some(Seq("d0", "d3", "island"))
    val base = PageRank.ranks(edges.toDF("src", "dst", "w"),
        iterations = 10, seeds = seeds)
      .as[(String, Long)].collect().toMap
    val dist = PageRank.ranks(edges.toDF("src", "dst", "w"),
        iterations = 10, seeds = seeds, driverGateEdges = 0L)
      .as[(String, Long)].collect().toMap
    assert(base == dist, "driver and distributed personalized iterates must match")
    assert(base.contains("island"), "off-graph seed must join the node set")
    assert(math.abs(base.values.sum - 1000000000L) <= base.size)
  }

  test("CLI rank-domains: url + html corpus → ranked domains, both algos") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cli_rd").toFile
    try {
      // three pages: a.example links to b, b links to a and c, c to a
      Seq(
        (1L, "https://www.a.example/p",
          """<html><a href="https://b.example/x">b</a></html>"""),
        (2L, "http://b.example:80/q",
          """<a href="https://a.example/">a</a><a href="https://c.example/">c</a>"""),
        (3L, "https://c.example/r",
          """<p>text</p><a href="https://a.example/z">a</a>"""))
        .toDF("doc_id", "url", "text")
        .write.parquet(s"$dir/docs")
      def cli(a: String*): String = {
        val bos = new java.io.ByteArrayOutputStream()
        Console.withOut(new java.io.PrintStream(bos)) {
          Cli.run(spark, a.toArray)
        }
        bos.toString("UTF-8").linesIterator
          .filter(_.startsWith("{")).toSeq.last
      }
      val pr = cli("rank-domains", s"$dir/docs", s"$dir/pr")
      assert(pr.contains("\"n_domains\":3") && pr.contains("\"n_edges\":4"), pr)
      val ranks = spark.read.parquet(s"$dir/pr")
        .as[(String, Long)].collect().toMap
      // a.example has two in-links (from b and c) — it must rank first
      assert(ranks.keySet == Set("a.example", "b.example", "c.example"))
      assert(ranks("a.example") > ranks("b.example") &&
        ranks("b.example") > ranks("c.example"))
      assert(math.abs(ranks.values.sum - 1000000000L) <= 3)
      val h = cli("rank-domains", s"$dir/docs", s"$dir/hits", "-", "-",
        "hits", "5")
      assert(h.contains("\"algo\":\"hits\"") && h.contains("\"n_domains\":3"), h)
      val hits = spark.read.parquet(s"$dir/hits")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(hits("a.example")._2 > hits("c.example")._2,
        "a must out-rank c on authority")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("pagerank: driver gate path ≡ distributed path ≡ staged path, " +
    "invariant under edge re-sharding") {
    val edges = (0 until 30).map { i =>
      (s"d${i % 7}", s"d${(i * 2 + 1) % 7}", 1L + i % 4)
    } ++ Seq(("dangle_src", "d0", 2L), ("d1", "sink", 1L)) // sink dangles
    val base = ranksOf(edges) // driver path (under the gate)
    val dist = ranksOf(edges, gate = 0L) // forced distributed loop
    assert(base == dist, "driver and distributed iterates must be bit-identical")
    val reshard = PageRank.ranks(
        edges.toDF("src", "dst", "w").repartition(5, col("dst")),
        iterations = 10, driverGateEdges = 0L)
      .as[(String, Long)].collect().toMap
    assert(base == reshard)
    val dir = java.nio.file.Files.createTempDirectory("prstage").toFile
    try {
      val staged = ranksOf(edges, staging = Some(dir.getAbsolutePath),
        gate = 0L)
      assert(base == staged)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
