package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the round-10 additions: t30's BM25 ranking vs a
  * driver-side brute-force recompute, g36's synchronous label-propagation
  * rounds replayed in the driver, s15's change-set case analysis against
  * the snapshots' modular construction, and st14's non-vacuity (the
  * judged timeout emission set must actually exercise the timer path). */
class Round10OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("t30: BM25 top-10 equals a driver-side brute-force recompute") {
    val qTerms = Set("scan", "join", "merge")
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val n = docs.length.toLong
    val t = docs.map(_._2.length.toLong).sum
    val dl = docs.map { case (id, ws) => id -> ws.length.toLong }.toMap
    val tf = docs.flatMap { case (id, ws) =>
      ws.filter(qTerms).map(w => (id, w))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val df = tf.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = tf.toSeq.groupBy(_._1._1).map { case (id, terms) =>
      val score = terms.map { case ((_, w), f) =>
        val idf = math.log((2 * n + 2).toDouble / (2 * df(w) + 1).toDouble)
        val sat = (44L * f * t).toDouble /
          (20L * f * t + 6L * t + 18L * dl(id) * n).toDouble
        math.round(idf * sat * 1000000).toLong
      }.sum
      (id, terms.size.toLong, score)
    }.toSeq.sortBy { case (id, _, sc) => (-sc, id) }.take(10)
    val got = SparkEntry.queries("t30_bm25_retrieval")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected, s"got $got expected $expected")
  }

  test("g36: three synchronous LPA rounds replayed in the driver match the judged labels") {
    import graft.engine.{Tables, Trajectory}
    // the same region²-bounded weighted adjacency the query builds
    val trans = Trajectory.transitions(Trajectory.hourlyState(Tables.events(spark, dir)))
      .where(col("src") =!= col("dst") && col("src") =!= "0" && col("dst") =!= "0")
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val adj = (trans.map { case (a, b, w) => ((a, b), w) } ++
        trans.map { case (a, b, w) => ((b, a), w) })
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val byV = adj.toSeq.map { case ((v, u), w) => (v, u, w) }.groupBy(_._1)
    var labels = byV.keys.map(v => v -> v).toMap
    for (_ <- 1 to 3) {
      labels = byV.map { case (v, nbrs) =>
        val votes = nbrs.map { case (_, u, w) => (labels(u), w) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
        // max weight, then min label — the judged min(struct(-w, lbl))
        v -> votes.minBy { case (lbl, w) => (-w, lbl) }._1
      }
    }
    val expected = labels.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("g36_label_communities")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == expected, s"got ${got.take(10)}… expected ${expected.take(10)}…")
    // LPA must actually coarsen: fewer communities than nodes, more than one
    val nComm = got.map(_._2).distinct.size
    assert(nComm > 1 && nComm < got.size, s"degenerate community structure: $nComm of ${got.size}")
  }

  test("s15: every change row obeys the snapshots' modular construction, all classes exercised") {
    val rows = SparkEntry.queries("s15_snapshot_diff")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (k, c) =>
      val expected =
        if (k % 7 == 0 && k % 11 != 3) "added"
        else if (k % 11 == 3 && k % 7 != 0) "removed"
        else if (k % 5 == 0 && k % 7 != 0 && k % 11 != 3) "changed"
        else fail(s"key $k should not be in the change set")
      assert(c == expected, s"key $k: got $c expected $expected")
    }
    val byClass = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(Set("added", "removed", "changed").subsetOf(byClass.keySet),
      s"fixture must exercise all three change classes: $byClass")
    // and the change set is COMPLETE: every key the construction flags is present
    val keys = graft.engine.Tables(spark, dir, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val want = keys.filter(k =>
      (k % 7 == 0 && k % 11 != 3) || (k % 11 == 3 && k % 7 != 0) ||
        (k % 5 == 0 && k % 7 != 0 && k % 11 != 3)).toSet
    assert(rows.map(_._1).toSet == want,
      s"change set incomplete: missing ${(want -- rows.map(_._1)).take(5)}")
  }

  test("st14: the judged timeout emission set is non-vacuous at sf0.001") {
    // an all-active fixture would make the oracle trivially empty and the
    // timer path unjudged — the thinning coin must leave at least one
    // genuinely timed-out session
    val rows = SparkEntry.queries("st14_session_timeout")(spark, dir).collect()
    assert(rows.nonEmpty, "no session ever timed out — the judged query is vacuous")
  }
}
