package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the round-5 third-wave operators: t21 Bloom
  * decontamination, t22 unigram-LM quality, v16 PQ-ADC search, g26
  * OD-flow entropy, g27 k-anonymity generalization. */
class Round5cOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("t21: bloom flags every true contaminant at any filter size; tiny filters surface FPs") {
    val s = spark; import s.implicits._
    // constructed corpus: d0/d1 live in both splits (true contamination),
    // d2..d9 are train-only, dX is test-only
    val tagged = (Seq(
      (1L, "d0", "train"), (2L, "d1", "train"),
      (100L, "d0", "test"), (101L, "d1", "test"), (102L, "dX", "test")) ++
      (3L to 10L).map(i => (i, s"d${i - 1}", "train")))
      .toDF("doc_id", "digest", "split")
    // scale-adaptive m: fill stays ~k/64, so exactly the true hits flag
    val adaptive = graft.queries.TextQueries.bloomDecontaminate(tagged, None)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(adaptive == Map(1L -> true, 2L -> true), s"adaptive-m output: $adaptive")
    // forced m=4: the filter saturates. A contaminant's positions are BY
    // CONSTRUCTION a subset of the set bits (its digest is in the test
    // set), so it can never escape — the Bloom no-false-negative
    // guarantee — while unrelated train docs now collide in as
    // confirmed=false false positives
    val tiny = graft.queries.TextQueries.bloomDecontaminate(tagged, Some(4L))
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(Set(1L, 2L).subsetOf(tiny.keySet), "a true contaminant escaped the small filter")
    assert(tiny.exists(!_._2), "no false positives at m=4 — the FP path is not exercised")
    tiny.filter(_._2).keySet.foreach(id =>
      assert(Set(1L, 2L)(id), s"doc $id confirmed without a test-split digest"))
  }

  test("t22: LM scores are nonpositive, token counts match, extremes recompute exactly") {
    val out = SparkEntry.queries("t22_lm_quality")(spark, dir).persist()
    val docs = graft.engine.Tables(spark, dir, "documents")
    assert(out.count() == docs.count())
    assert(out.where(col("avg_logp") > 0.0).count() == 0, "a doc scored above ln(1) = 0")
    val mismatch = out.join(docs, "doc_id")
      .where(col("n_tok") =!= size(split(col("text"), " "))).count()
    assert(mismatch == 0, "n_tok disagrees with the document's own word count")
    // independent recomputation for the best-scoring doc
    val toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val n = toks.count().toDouble
    val best = out.orderBy(col("avg_logp").desc, col("doc_id")).first()
    val cs = toks.where(col("doc_id") === best.getLong(0)).join(vocab, "w")
      .select(col("c")).collect().map(_.getLong(0))
    val recomputed = cs.map(c => math.log(c / n)).sum / cs.length
    assert(math.abs(recomputed - best.getDouble(2)) < 1e-4,
      s"recomputed $recomputed vs judged ${best.getDouble(2)}")
    out.unpersist()
  }

  test("v16: PQ top-5 is well-formed, self-free, and ADC-ordered") {
    val rows = SparkEntry.queries("v16_pq_adc")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == 10 && byQ.values.forall(_.length == 5),
      s"expected 10 queries x 5 rows, got ${rows.length}")
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == Seq(1L, 2L, 3L, 4L, 5L), s"q$q ranks broken")
      sorted.foreach { case (qid, _, vid, adc) =>
        assert(vid != qid, s"q$q returned itself")
        assert(adc >= 0L, s"q$q negative squared distance $adc")
      }
      val adcs = sorted.map(_._4).toSeq
      assert(adcs == adcs.sorted, s"q$q ADC not ascending with rank: $adcs")
    }
  }

  test("g26: entropy bounds hold and the widest origin recomputes exactly") {
    val out = SparkEntry.queries("g26_od_entropy")(spark, dir).persist()
    val rows = out.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDst, _, e, ne) =>
      assert(e >= 0.0 && e <= math.log(nDst.toDouble) + 1e-6,
        s"$src entropy $e outside [0, ln($nDst)]")
      assert(ne >= 0.0 && ne <= 1.0 + 1e-6, s"$src norm entropy $ne outside [0, 1]")
      if (nDst == 1) assert(e == 0.0 && ne == 0.0, s"$src single-dst entropy not pinned to 0")
    }
    val widest = rows.maxBy(_._2)
    val cnts = graft.engine.Trajectory.transitions(
        graft.engine.Trajectory.hourlyState(graft.engine.Tables.events(spark, dir)))
      .where(col("src") === widest._1)
      .groupBy(col("dst")).agg(count(lit(1)).as("c"))
      .collect().map(_.getLong(1))
    val t = cnts.sum.toDouble
    val ent = math.log(t) - cnts.map(c => c * math.log(c.toDouble)).sum / t
    assert(math.abs(ent - widest._4) < 1e-4,
      s"recomputed ${ent} vs judged ${widest._4} for src ${widest._1}")
    out.unpersist()
  }

  test("g27: published rows satisfy K, generalization covers exactly the sub-K cells, suppression binds") {
    val d01 = "/root/testdata/sf0.01" // sf0.001 presence is too sparse for any cell to reach K
    val out = SparkEntry.queries("g27_k_anonymity")(spark, d01).persist()
    val byLevel = out.groupBy(col("level")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLevel.getOrElse("gh3", 0L) > 0 && byLevel.getOrElse("gh2", 0L) > 0,
      s"a branch is vacuous: $byLevel")
    assert(out.where(col("n_users") < 3).count() == 0, "published cell below K")
    val base = graft.engine.Trajectory.complete(graft.engine.Tables.events(spark, d01))
      .groupBy(col("hour"), col("region")).agg(count(lit(1)).as("n")).persist()
    val recomputed = base.where(col("n") < 3)
      .groupBy(col("hour"), substring(col("region"), 1, 2).as("cell"))
      .agg(sum(col("n")).as("n2")).where(col("n2") >= 3).count()
    assert(byLevel("gh2") == recomputed,
      s"gh2 rows ${byLevel("gh2")} != recomputed sub-K rollups $recomputed")
    val totalMass = base.agg(sum(col("n"))).collect()(0).getLong(0)
    val published = out.agg(sum(col("n_users"))).collect()(0).getLong(0)
    assert(published < totalMass, "no user-hour mass was suppressed — the gate is vacuous")
    base.unpersist(); out.unpersist()
  }
}
