package graft

import org.apache.spark.sql.functions._
import graft.operators.Hits

/** Integer-exact HITS: hand-iterated fixtures (chain, weighted fan-out,
  * cycle), mass conservation per vector, and the driver ≡ distributed
  * contract.
  */
class HitsSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(edges: Seq[(String, String, Long)],
                      gate: Long = 1000000L): Map[String, (Long, Long)] =
    Hits.ranks(edges.toDF("src", "dst", "w"), iterations = 5,
        driverGateEdges = gate)
      .as[(String, Long, Long)].collect()
      .map { case (n, h, a) => n -> (h, a) }.toMap

  test("hits: single edge — pure hub and pure authority") {
    assert(ranksOf(Seq(("a", "b", 1L))) ==
      Map("a" -> (1000000000L, 0L), "b" -> (0L, 1000000000L)))
  }

  test("hits: weighted fan-out splits authority 3:1") {
    assert(ranksOf(Seq(("a", "b", 3L), ("a", "c", 1L))) ==
      Map("a" -> (1000000000L, 0L), "b" -> (0L, 750000000L),
        "c" -> (0L, 250000000L)))
  }

  test("hits: cyclic weighted fixture, iterated by hand") {
    assert(ranksOf(Seq(("a", "b", 1L), ("b", "c", 2L), ("c", "a", 1L),
      ("a", "c", 1L))) ==
      Map("a" -> (381923025L, 351001L), "b" -> (617942872L, 190944191L),
        "c" -> (134102L, 808704808L)))
  }

  test("hits: both vectors conserve mass within per-node rounding slack") {
    val edges = (0 until 40).flatMap { i =>
      Seq((s"n$i", s"n${(i * 3 + 1) % 17}", 1L + i % 3),
        (s"n$i", s"n${(i * 5 + 2) % 23}", 1L))
    }
    val r = ranksOf(edges)
    val (hubs, auths) = (r.values.map(_._1).sum, r.values.map(_._2).sum)
    assert(math.abs(hubs - 1000000000L) <= r.size, s"hub mass: $hubs")
    assert(math.abs(auths - 1000000000L) <= r.size, s"auth mass: $auths")
  }

  test("hits: driver gate path ≡ distributed path, re-shard invariant") {
    val edges = (0 until 30).map { i =>
      (s"d${i % 7}", s"d${(i * 2 + 1) % 7}", 1L + i % 4)
    } ++ Seq(("hub_only", "d0", 2L), ("d1", "auth_only", 1L))
    val base = ranksOf(edges)
    val dist = ranksOf(edges, gate = 0L)
    assert(base == dist, "driver and distributed iterates must be bit-identical")
    val reshard = Hits.ranks(
        edges.toDF("src", "dst", "w").repartition(5, col("dst")),
        iterations = 5, driverGateEdges = 0L)
      .as[(String, Long, Long)].collect()
      .map { case (n, h, a) => n -> (h, a) }.toMap
    assert(base == reshard)
  }
}
