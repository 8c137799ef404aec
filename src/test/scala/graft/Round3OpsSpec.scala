package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantics checks for the round-3 operators, cross-validated against
  * driver-side brute force at sf0.001 (small enough to collect). */
class Round3OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("j07: as-of result equals brute force over collected events") {
    val events = graft.engine.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))
    val clicks = events.filter(_._4 == "click")
    val expected = events.filter(_._4 == "purchase").map { case (eid, uid, ts, _) =>
      val best = clicks.filter(c => c._2 == uid && !c._3.after(ts))
        .sortBy(c => (c._3.getTime, c._1)).lastOption
      (uid, eid) -> best.map(_._1)
    }.toMap
    val got = SparkEntry.queries("j07_asof_join")(spark, dir).collect().map {
      case Row(uid: Long, eid: Long, _, click, _) =>
        (uid, eid) -> Option(click).map(_.asInstanceOf[Long])
    }.toMap
    assert(got.keySet == expected.keySet)
    assert(got == expected)
  }

  test("j08: range boundaries are [start, end) and overlaps double-count") {
    val rows = SparkEntry.queries("j08_range_join")(spark, dir).collect()
    assert(rows.nonEmpty)
    val events = graft.engine.Tables.events(spark, dir)
      .select(col("ts"), col("user_id")).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1)))
    val days = events.map(_._1.toLocalDateTime.toLocalDate).distinct
      .filter(_.getDayOfMonth % 5 == 2)
    for (d <- days) {
      val start = d.atTime(6, 0)
      val end = start.plusDays(7)
      val in = events.filter { case (ts, _) =>
        val t = ts.toLocalDateTime
        !t.isBefore(start) && t.isBefore(end)
      }
      val row = rows.find(_.getString(0) == d.toString)
      assert(row.isDefined, s"promo $d missing")
      assert(row.get.getLong(1) == in.length.toLong, s"promo $d count")
      assert(row.get.getLong(2) == in.map(_._2).distinct.length.toLong, s"promo $d users")
    }
  }

  test("t10: clusters are transitive fixpoints with one representative") {
    val rows = SparkEntry.queries("t10_dup_clusters")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    val byDoc = rows.toMap
    // cluster id is the component minimum: always <= the member's id,
    // always itself a member, and exactly the rep of its own cluster
    rows.foreach { case (doc, (cl, isRep)) =>
      assert(cl <= doc)
      assert(isRep == (cl == doc))
      assert(byDoc(cl)._1 == cl, s"cluster id $cl is not its own cluster root")
    }
    val reps = rows.filter(_._2._2).map(_._1).toSet
    assert(rows.map(_._2._1).toSet == reps, "every cluster has exactly one rep")
    // the constructed near-duplicates (doc i ~ doc i+offset) must land in
    // the same cluster — an exact copy collides on every LSH band
    rows.filter(_._1 >= 1000000000000L).foreach { case (seed, (cl, _)) =>
      assert(byDoc.contains(seed - 1000000000000L), s"seed $seed missing base")
      assert(byDoc(seed - 1000000000000L)._1 == cl, s"seed $seed split from base")
    }
  }
}
