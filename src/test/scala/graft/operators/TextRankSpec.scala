package graft.operators

import graft.{SparkSpec, Tables}
import scala.collection.mutable

/** TextRank: full driver-side replay of the integer recurrence — the
  * distributed iteration must hold bit-identical ranks to a plain Scala
  * fold over the same graph (the oracle then pins the same property
  * against DuckDB at sf0.01).
  */
class TextRankSpec extends SparkSpec {

  test("text_textrank_int equals an exact driver replay at sf0.001; " +
      "ranks move off the uniform start and high-degree hubs lead") {
    val texts = Tables.load(spark, sfDir, "documents")
      .select("text").collect().map(_.getString(0))

    // plain-Scala graph build: undirected adjacent-pair counts
    val e = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for (t <- texts; pair <- t.split("\\s+").sliding(2)
         if pair.length == 2) {
      e((pair(0), pair(1))) += 1
      e((pair(1), pair(0))) += 1
    }
    val wd = e.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    var r = wd.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = mutable.Map.empty[String, Long].withDefaultValue(0L)
      for (((u, v), cnt) <- e) in(v) += (cnt * r(u)) / wd(u)
      r = r.keys.map(w => w -> (150000L + (85L * in(w)) / 100L)).toMap
    }

    val got = graft.SparkEntry.queries("text_textrank_int")(spark, sfDir)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got.keySet == r.keySet)
    got.foreach { case (w, rank) =>
      assert(rank == r(w), s"$w: spark $rank != replay ${r(w)}")
    }
    assert(got.values.toSet.size > 1, "ranks never moved off uniform")
    // centrality sanity: the max-degree hub outranks the min-degree node
    val hub = wd.maxBy(_._2)._1
    val leaf = wd.minBy(_._2)._1
    assert(got(hub) > got(leaf),
      s"hub $hub (${got(hub)}) should outrank leaf $leaf (${got(leaf)})")
  }
}
