package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Plain-Scala ground truth for the integer-arithmetic PageRank: the
  * whole trajectory recomputed with Scala Longs must match exactly
  * (there are no doubles anywhere in the score path to tolerate).
  */
class PageRankSpec extends SparkSpec {

  test("pageRank trajectory matches an exact integer recompute") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct().collect()
      .map(r => (s"u:${r.getLong(0)}", s"t:${r.getString(1)}"))
    val edges = ev.flatMap { case (u, t) => Seq((u, t), (t, u)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nodes = deg.keys.toSeq.sorted
    val n = nodes.size.toLong
    val s0 = Graph.PrScale / n
    val base = 3L * Graph.PrScale / (20L * n)
    var cur: Map[String, Long] = nodes.map(_ -> s0).toMap
    val traj = scala.collection.mutable.ArrayBuffer[(Int, String, Long)]()
    nodes.foreach(nd => traj += ((0, nd, s0)))
    for (i <- 1 to Graph.PrIters) {
      val contrib = scala.collection.mutable.Map.empty[String, Long]
      edges.foreach { case (src, dst) =>
        contrib(dst) = contrib.getOrElse(dst, 0L) + cur(src) / deg(src)
      }
      cur = nodes.map(nd => nd -> (base + 17L * contrib.getOrElse(nd, 0L) / 20L)).toMap
      nodes.foreach(nd => traj += ((i, nd, cur(nd))))
    }
    val expected = traj.toSeq.sortBy(t => (t._1, t._2))
    val got = Graph.pageRank(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == expected)
  }

  test("pageRank is sane: hubs dominate and mass stays bounded") {
    val finalRound = Graph.pageRank(spark, sf)
      .filter(col("iter") === Graph.PrIters).collect()
      .map(r => (r.getString(1), r.getLong(2)))
    // every score positive, total never exceeds the initial mass
    // (integer truncation only LEAKS mass, never creates it)
    assert(finalRound.forall(_._2 > 0))
    assert(finalRound.map(_._2).sum <= Graph.PrScale)
    // the event-type hubs (degree ~ |users|) must outrank every user
    val (types, users) = finalRound.partition(_._1.startsWith("t:"))
    assert(types.map(_._2).min > users.map(_._2).max,
      "a bipartite hub scored below a leaf")
  }
}
