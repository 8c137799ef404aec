package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the round-12 additions, starting with the
  * filtered vector search pair: v30 must return ONLY admissible
  * (label-filtered) neighbors, and its pre-filtering must dominate the
  * naive post-filter of the unfiltered probe per query — the property
  * that makes pre-filtering the correct production semantics, which
  * the hash compare alone cannot see (both engines share the
  * pre-filter plan). v31's recall row is bounds-checked against its
  * own (n_hit, k) columns. */
class Round12OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private val admissible = Set(2, 5)

  test("v30: every returned neighbor satisfies the metadata predicate") {
    val rows = graft.queries.VectorQueries.queries("v30_filtered_search")(spark, dir)
      .select(col("q_id"), col("vec_id"), col("label")).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => admissible.contains(r.getInt(2))),
      "v30 returned a neighbor outside the filter predicate")
    // top-3 contract: no query exceeds k
    val perQ = rows.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perQ.values.forall(_ <= 3))
  }

  test("v30: pre-filtering dominates post-filtering the unfiltered probe") {
    // post-filter strawman: take v05's UNFILTERED top-3 and drop the
    // inadmissible rows — the shortcut a naive integration would take
    val post = graft.queries.VectorQueries.queries("v05_ann_ivf")(spark, dir)
      .join(
        graft.engine.Tables(spark, dir, "embeddings").select(col("vec_id"), col("label")),
        Seq("vec_id"))
      .where(col("label").isin(admissible.toSeq.map(Integer.valueOf): _*))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pre = graft.queries.VectorQueries.queries("v30_filtered_search")(spark, dir)
      .groupBy(col("q_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every query: pre-filtering returns at least as many admissible
    // neighbors as post-filtering (it scans the whole admissible slice
    // of the cell, not the admissible subset of an unfiltered top-3)
    val qids = pre.keySet ++ post.keySet
    assert(qids.nonEmpty)
    qids.foreach { q =>
      assert(pre.getOrElse(q, 0L) >= post.getOrElse(q, 0L),
        s"query $q: pre-filtered count < post-filtered count")
    }
    // and strictly more in aggregate at this fixture — if the two ever
    // coincide the strawman stops being a strawman and the test should
    // force a fixture rethink rather than pass vacuously
    assert(pre.values.sum > post.values.sum,
      "pre-filtering found no advantage over post-filtering at this fixture")
  }

  test("st16: both recovery waves are non-empty and partition the fixture") {
    import org.apache.spark.sql.functions._
    // st16's exactly-once-across-restart proof is vacuous if either
    // staged wave is empty (no state to recover, or no restart input);
    // pin the deterministic hash split's shape on the fixture
    val raw = graft.engine.Tables.rawEvents(spark, dir)
    val half = pmod(graft.queries.Portable.portableHash(col("event_id").cast("string")), lit(2))
    val byHalf = raw.groupBy(half.as("h")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byHalf.getOrElse(0L, 0L) > 0L, "wave 0 is empty — st16 recovers nothing")
    assert(byHalf.getOrElse(1L, 0L) > 0L, "wave 1 is empty — st16 never restarts on data")
    assert(byHalf.values.sum == raw.count(), "halves must partition the fixture")
  }

  test("v31: recall row is internally consistent and covers all queries") {
    val rows = graft.queries.VectorQueries.queries("v31_filtered_recall")(spark, dir)
      .collect()
    assert(rows.map(_.getLong(0)).toSet == (10L until 20L).toSet,
      "v31 must emit one row per query, including zero-hit queries")
    rows.foreach { r =>
      val (nHit, k, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(k >= 1L && k <= 3L)
      assert(nHit >= 0L && nHit <= k)
      assert(math.abs(recall - nHit.toDouble / k) < 1e-4)
    }
  }
}
