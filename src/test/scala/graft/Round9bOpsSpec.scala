package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the round-9 additions: the v21 Matryoshka funnel
  * (driver-side brute-force cross-check), the g31 distance-decay fit
  * (plain-double OLS vs the judged scaled-long form), and w09's
  * equal-depth fold invariants. */
class Round9bOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("v21: funnel top-3 equals a driver-side brute-force two-stage rerank") {
    val embs = graft.engine.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot(a: Array[Float], b: Array[Float], n: Int): Double = {
      var s = 0.0; var i = 0
      while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    val expected = embs.filter { case (id, _) => id >= 10 && id < 20 }
      .sortBy(_._1).flatMap { case (qid, q) =>
        val qn = math.sqrt(dot(q, q, 64)); val qpn = math.sqrt(dot(q, q, 16))
        val short = embs.filter(_._1 != qid)
          .map { case (id, e) =>
            (id, e, round6(dot(q, e, 16) / (qpn * math.sqrt(dot(e, e, 16)))))
          }
          .sortBy { case (id, _, pcos) => (-pcos, id) }.take(16)
        short
          .map { case (id, e, _) =>
            (id, round6(dot(q, e, 64) / (qn * math.sqrt(dot(e, e, 64)))))
          }
          .sortBy { case (id, cos) => (-cos, id) }.take(3).zipWithIndex
          .map { case ((id, cos), i) => (qid, (i + 1).toLong, id, cos) }
      }.toSeq
    val got = SparkEntry.queries("v21_mrl_funnel")(spark, dir)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))).toSeq
    assert(got.map(t => (t._1, t._2, t._3)) == expected.map(t => (t._1, t._2, t._3)),
      s"got $got expected $expected")
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-9, s"cos drift: $g vs $e")
    }
  }

  test("v22: funnel recall is in (0, 1] and the funnel can only lose vs exact") {
    val rows = SparkEntry.queries("v22_ann_recall_mrl")(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val recall = r.getAs[Double]("recall")
      val nHit = r.getAs[Long]("n_hit"); val k = r.getAs[Long]("k")
      assert(k == 3L && nHit >= 0L && nHit <= k, r.toString)
      assert(recall >= 0.0 && recall <= 1.0, r.toString)
    }
    // the 16-wide shortlist must beat chance by orders of magnitude
    // (chance = 16/corpus ≈ 1%). The synthetic embeddings are random,
    // not MRL-trained — prefixes carry only 16/64 of the signal — so a
    // trained-model recall bar (0.9+) would be wrong here; 0.2 proves
    // the prefix stage is really ranking, not sampling.
    val total = rows.map(_.getAs[Long]("n_hit")).sum.toDouble /
      rows.map(_.getAs[Long]("k")).sum.toDouble
    assert(total >= 0.2, s"funnel recall collapsed: $total")
  }

  test("g31: the scaled-long OLS equals a plain-double driver-side fit") {
    // flows re-derived from the independently judged g09 OD matrix
    val flows = SparkEntry.queries("g09_mobility_od")(spark, dir)
      .groupBy(col("src"), col("dst")).agg(sum(col("cnt")).as("flow"))
      .where(col("src") =!= "0" && col("dst") =!= "0" && col("src") =!= col("dst"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // centroids re-derived with plain double means (no scaled-long sums)
    val k = graft.queries.Portable.fixKey(col("user_id"), col("ts"))
    val cent = graft.engine.Tables(spark, dir, "events")
      .select(graft.functions.GeoFunctions.geohashCol(
          graft.queries.Portable.latFromKey(k),
          graft.queries.Portable.lonFromKey(k), 3).as("region"),
        graft.queries.Portable.latFromKey(k).as("lat"),
        graft.queries.Portable.lonFromKey(k).as("lon"))
      .collect().groupBy(_.getString(0))
      .map { case (rg, rows) =>
        rg -> (rows.map(_.getDouble(1)).sum / rows.length,
               rows.map(_.getDouble(2)).sum / rows.length)
      }
    def hav(la1: Double, lo1: Double, la2: Double, lo2: Double): Double = {
      val dLat = math.toRadians(la2 - la1); val dLon = math.toRadians(lo2 - lo1)
      val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
        math.cos(math.toRadians(la1)) * math.cos(math.toRadians(la2)) *
          math.sin(dLon / 2) * math.sin(dLon / 2)
      2 * 6372800.0 * math.atan2(math.sqrt(a), math.sqrt(1 - a))
    }
    val xy = flows.flatMap { case (srcRg, dstRg, flow) =>
      for ((sLat, sLon) <- cent.get(srcRg); (dLat, dLon) <- cent.get(dstRg);
           d = hav(sLat, sLon, dLat, dLon) if d > 0.05)
        yield (math.log(d), math.log(flow.toDouble))
    }
    val n = xy.length.toDouble
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxy = xy.map(t => t._1 * t._2).sum; val sxx = xy.map(t => t._1 * t._1).sum
    val syy = xy.map(t => t._2 * t._2).sum
    val cov = n * sxy - sx * sy; val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    val row = SparkEntry.queries("g31_distance_decay")(spark, dir).collect().head
    assert(row.getAs[Long]("n_pairs") == xy.length.toLong, row.toString)
    assert(math.abs(row.getAs[Double]("decay_exp") - cov / varx) < 1e-3, row.toString)
    assert(math.abs(row.getAs[Double]("intercept") - (sy - cov / varx * sx) / n) < 1e-3,
      row.toString)
    assert(math.abs(row.getAs[Double]("r2") - cov * cov / (varx * vary)) < 1e-3,
      row.toString)
    val r2 = row.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
  }

  test("v23: hard negatives always cross labels and are the best cross-label candidates") {
    val embs = graft.engine.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Float](2).toArray))
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < 64) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    val got = SparkEntry.queries("v23_hard_negatives")(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("q_label"),
        r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("neg_label"), r.getAs[Double]("cos")))
    assert(got.length == 30)
    val byId = embs.map(e => e._1 -> e).toMap
    got.foreach { case (qid, qLabel, _, vid, negLabel, _) =>
      assert(byId(qid)._2 == qLabel && byId(vid)._2 == negLabel, s"$qid/$vid")
      assert(negLabel != qLabel, s"same-label negative for anchor $qid: $vid")
    }
    // rank-1 negative = the brute-force best cross-label candidate
    got.filter(_._3 == 1L).foreach { case (qid, qLabel, _, vid, _, _) =>
      val q = byId(qid)._3
      val qn = math.sqrt(dot(q, q))
      val best = embs.filter(e => e._1 != qid && e._2 != qLabel)
        .map(e => (e._1, round6(dot(q, e._3) / (qn * math.sqrt(dot(e._3, e._3))))))
        .minBy { case (id, c) => (-c, id) }._1
      assert(vid == best, s"anchor $qid: got $vid expected $best")
    }
  }

  test("q10: DSIR importance scores equal a driver-side hashed-ngram recompute") {
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // driver-side twin of the portable hash → bucket
    val hashed = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0)
      .select(col("doc_id"),
        pmod(graft.queries.Portable.portableHash(col("w")), lit(64L)).as("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lang = docs.map(d => d._1 -> d._2).toMap
    val rawB = hashed.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val tgtB = hashed.filter(h => lang(h._1) == "en")
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val totR = rawB.values.sum; val totT = tgtB.values.sum
    val term: Map[Long, Long] = rawB.map { case (b, rc) =>
      val tc = tgtB.getOrElse(b, 0L)
      val lt = math.log((tc + 1).toDouble / (totT + 64).toDouble)
      val lr = math.log((rc + 1).toDouble / (totR + 64).toDouble)
      b -> BigDecimal((lt - lr) * 1000000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val weights = hashed.groupBy(_._1).view.mapValues { hs =>
      hs.groupBy(_._2).map { case (b, g) => g.length.toLong * term(b) }.sum
    }.toMap
    val expected = weights.toSeq.map { case (id, w) => (id, lang(id), w) }
      .sortBy { case (id, _, w) => (-w, id) }.take(40)
    val got = SparkEntry.queries("q10_dsir_select")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("w_ppm"))).toSeq
    assert(got == expected, s"got ${got.take(5)}... expected ${expected.take(5)}...")
    // the target-domain docs must actually rank up: the top-40 should be
    // majority-'en' (that is the entire point of the importance weight)
    assert(got.count(_._2 == "en") > 20, got.map(_._2).mkString(","))
  }

  test("g32: interior masses and radiation predictions equal a driver-side recompute") {
    val cm = graft.queries.GeoQueries.regionCentroids(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    val flows = graft.queries.GeoQueries.regionFlows(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    def hav(la1: Double, lo1: Double, la2: Double, lo2: Double): Double = {
      val dLat = math.toRadians(la2 - la1); val dLon = math.toRadians(lo2 - lo1)
      val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
        math.cos(math.toRadians(la1)) * math.cos(math.toRadians(la2)) *
          math.sin(dLon / 2) * math.sin(dLon / 2)
      BigDecimal(2 * 6372800.0 * math.atan2(math.sqrt(a), math.sqrt(1 - a)))
        .setScale(1, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byRegion = cm.map(c => c._1 -> c).toMap
    val tOut = flows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val top = flows.sortBy { case (s, d, f) => (-f, s, d) }.take(50)
    val expected = top.map { case (srcRg, dstRg, flow) =>
      val (_, sLat, sLon, mSrc) = byRegion(srcRg)
      val (_, dLat, dLon, nDst) = byRegion(dstRg)
      val dij = hav(sLat, sLon, dLat, dLon)
      val sBetween = cm.filter(c => c._1 != srcRg && c._1 != dstRg &&
        hav(sLat, sLon, c._2, c._3) < dij).map(_._4).sum
      val pred = tOut(srcRg).toDouble * ((mSrc.toDouble * nDst.toDouble) /
        ((mSrc + sBetween).toDouble * (mSrc + nDst + sBetween).toDouble))
      (srcRg, dstRg, flow, mSrc, nDst, sBetween,
        BigDecimal(pred).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("g32_radiation_model")(spark, dir).collect()
      .map(r => (r.getAs[String]("src"), r.getAs[String]("dst"),
        r.getAs[Long]("flow"), r.getAs[Long]("m_src"), r.getAs[Long]("n_dst"),
        r.getAs[Long]("s_between"), r.getAs[Double]("pred_flow"))).toSeq
    assert(got == expected.toSeq, s"first diff: ${
      got.zip(expected).find { case (g, e) => g != e }}")
    // the model must actually bind: some corridor has interior mass
    assert(got.exists(_._6 > 0L), "no corridor had interior regions")
  }

  test("v24: three judged rounds equal a driver-side fixed-point power iteration, with monotone lambda") {
    val embs = graft.engine.Tables(spark, dir, "embeddings")
      .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
    def r0(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    var v = Array.fill(64)(0.125)
    val lambdas = collection.mutable.Buffer.empty[Double]
    for (_ <- 1 to 3) {
      // u = Σ_rows (e·v)·e via the same round(·×1e6)-long sums
      val sc = Array.fill(64)(0L)
      embs.foreach { e =>
        var dot = 0.0; var i = 0
        while (i < 64) { dot += e(i).toDouble * v(i); i += 1 }
        i = 0
        while (i < 64) { sc(i) += r0(dot * e(i).toDouble * 1000000); i += 1 }
      }
      val u = sc.map(_.toDouble / 1000000.0)
      val nrm = math.sqrt(u.map(x => r0(x * x * 1000000)).sum.toDouble / 1000000.0)
      lambdas += nrm
      v = u.map(x => r0(x / nrm * 1000000).toDouble / 1000000.0)
    }
    val got = SparkEntry.queries("v24_pca_power")(spark, dir).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Double]("loading"),
        r.getAs[Double]("lambda")))
    assert(got.length == 64)
    got.foreach { case (pos, loading, lambda) =>
      assert(loading == v((pos - 1).toInt), s"pos $pos: $loading vs ${v((pos - 1).toInt)}")
      assert(math.abs(lambda - BigDecimal(lambdas.last).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"lambda $lambda")
    }
    // power iteration's Rayleigh estimate is non-decreasing round over
    // round (up to the 1e-6 fixed-point hand-off)
    assert(lambdas(1) >= lambdas(0) - 1e-4 && lambdas(2) >= lambdas(1) - 1e-4,
      lambdas.mkString(","))
    // and the judged direction is genuinely unit-norm
    val n2 = got.map(t => t._2 * t._2).sum
    assert(math.abs(n2 - 1.0) < 1e-4, s"norm² = $n2")
  }

  test("t25: the dedup eval row is internally consistent and the seeded copies all collide") {
    val row = SparkEntry.queries("t25_dedup_recall_eval")(spark, dir).collect().head
    val nExact = row.getAs[Long]("n_exact"); val nCand = row.getAs[Long]("n_cand")
    val nHit = row.getAs[Long]("n_hit")
    assert(nHit <= nExact && nHit <= nCand, row.toString)
    // the 10 seeded exact copies (J = 1.0) have identical signatures, so
    // they collide in EVERY band — they are guaranteed hits
    assert(nExact >= 10L && nHit >= 10L, row.toString)
    assert(row.getAs[Double]("recall") ==
      BigDecimal(nHit.toDouble / nExact.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, row.toString)
    assert(row.getAs[Double]("cand_precision") ==
      BigDecimal(nHit.toDouble / nCand.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble, row.toString)
  }

  test("v25: Hamming top-3 equals a driver-side sign-code recompute") {
    val embs = graft.engine.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def code(e: Array[Float], from: Int): Long =
      (from until from + 32).map(i =>
        if (e(i - 1) >= 0f) 1L << (i - from) else 0L).sum
    val codes = embs.map { case (id, e) => (id, code(e, 1), code(e, 33)) }
    val expected = codes.filter(c => c._1 >= 10 && c._1 < 20).sortBy(_._1)
      .flatMap { case (qid, qlo, qhi) =>
        codes.filter(_._1 != qid)
          .map { case (id, lo, hi) =>
            (id, java.lang.Long.bitCount(lo ^ qlo).toLong +
              java.lang.Long.bitCount(hi ^ qhi).toLong)
          }
          .sortBy { case (id, h) => (h, id) }.take(3).zipWithIndex
          .map { case ((id, h), i) => (qid, (i + 1).toLong, id, h) }
      }.toSeq
    val got = SparkEntry.queries("v25_binary_hamming")(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("vec_id"), r.getAs[Long]("hamming"))).toSeq
    assert(got == expected, s"got ${got.take(6)} expected ${expected.take(6)}")
    // codes must use exactly 32 bits per half — a bit outside [0, 2^32)
    // means the shift layout drifted
    codes.foreach { case (id, lo, hi) =>
      assert(lo >= 0L && lo < (1L << 32) && hi >= 0L && hi < (1L << 32), s"vec $id")
    }
  }

  test("w10: funnel counts equal a driver-side ordered-step recompute") {
    val ev = graft.engine.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getString(2)))
    val byUser = ev.groupBy(_._1)
    val win = 24L * 3600 * 1000
    def next(es: Array[(Long, Long, String)], tpe: String, after: Long): Option[Long] = {
      val c = es.filter(e => e._3 == tpe && e._2 > after && e._2 <= after + win)
      if (c.isEmpty) None else Some(c.map(_._2).min)
    }
    var nView = 0L; var nClick = 0L; var nPurchase = 0L
    byUser.foreach { case (_, es) =>
      val views = es.filter(_._3 == "view")
      if (views.nonEmpty) {
        nView += 1
        val t1 = views.map(_._2).min
        next(es, "click", t1).foreach { t2 =>
          nClick += 1
          next(es, "purchase", t2).foreach(_ => nPurchase += 1)
        }
      }
    }
    val row = SparkEntry.queries("w10_funnel_conversion")(spark, dir).collect().head
    assert(row.getAs[Long]("n_view") == nView, row.toString)
    assert(row.getAs[Long]("n_click") == nClick, row.toString)
    assert(row.getAs[Long]("n_purchase") == nPurchase, row.toString)
    assert(row.getAs[Long]("conv1_ppm") ==
      (if (nView == 0) 0L else nClick * 1000000 / nView), row.toString)
    // the funnel must actually narrow — otherwise the step predicate
    // is not binding on this corpus
    assert(nClick < nView, s"step 2 did not filter: $nView -> $nClick")
  }

  test("u04: SCD2 intervals chain per user with exactly one current version") {
    val rows = SparkEntry.queries("u04_scd2_history")(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version"),
        r.getAs[String]("valid_from"), r.getAs[String]("valid_to"),
        r.getAs[Boolean]("is_current")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to vs.length).toSeq, s"user $u versions")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 == b._3, s"user $u: interval ${a._2} does not close at ${b._2}'s open")
        case _ =>
      }
      assert(sorted.count(_._5) == 1 && sorted.last._5, s"user $u current flag")
      assert(sorted.last._4 == "9999-12-31 00:00:00", s"user $u sentinel")
    }
    // change-compaction: consecutive versions never carry the same value
    val full = SparkEntry.queries("u04_scd2_history")(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("version"), r.getAs[Double]("val")))
    full.groupBy(_._1).foreach { case (u, vs) =>
      vs.sortBy(_._2).sliding(2).foreach {
        case Array(a, b) => assert(a._3 != b._3, s"user $u kept an unchanged version")
        case _ =>
      }
    }
  }

  test("t26: fertility aggregates are consistent with t24's per-doc encode") {
    val byLang = SparkEntry.queries("t26_bpe_fertility")(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tok"), r.getAs[Long]("fertility_ppm")))
    val byDoc = SparkEntry.queries("t24_bpe_encode")(spark, dir).collect()
      .map(r => (r.getAs[Long]("n_words"), r.getAs[Long]("n_tok")))
    // the two rollups partition the same join result: totals must agree
    assert(byLang.map(_._2).sum == byDoc.map(_._1).sum, "word totals diverge")
    assert(byLang.map(_._3).sum == byDoc.map(_._2).sum, "token totals diverge")
    byLang.foreach { case (lang, nw, nt, f) =>
      assert(nt >= nw, s"$lang: fewer tokens than words")
      assert(f == nt * 1000000 / nw, s"$lang: fertility inconsistent")
      // with only 3 trained merges almost every word stays multi-token
      assert(f > 1000000L, s"$lang: fertility at the 1-token floor")
    }
  }

  test("st13: the streaming funnel's stage distribution equals the batch w10 funnel") {
    val stages = SparkEntry.queries("st13_stream_funnel")(spark, dir).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("stage")))
    val w10 = SparkEntry.queries("w10_funnel_conversion")(spark, dir).collect().head
    assert(stages.map(_._1).distinct.length == stages.length, "duplicate users")
    assert(stages.length.toLong == w10.getAs[Long]("n_view"), "stage>=1 vs n_view")
    assert(stages.count(_._2 >= 2L).toLong == w10.getAs[Long]("n_click"),
      "stage>=2 vs n_click")
    assert(stages.count(_._2 == 3L).toLong == w10.getAs[Long]("n_purchase"),
      "stage=3 vs n_purchase")
  }

  test("v27: the nprobe curve is monotone and its points equal the judged v12/v14 aggregates") {
    val curve = SparkEntry.queries("v27_multiprobe_recall_curve")(spark, dir)
      .collect().map(r => (r.getAs[Long]("nprobe"), r.getAs[Long]("n_hit"),
        r.getAs[Long]("k"))).sortBy(_._1)
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // candidate sets nest, so recall can only grow with nprobe
    assert(curve(0)._2 <= curve(1)._2 && curve(1)._2 <= curve(2)._2,
      curve.mkString(","))
    // nprobe=1 IS the judged v12 single-probe eval; nprobe=2 IS v14's
    // two-cell multiprobe — the curve must reproduce both aggregates
    val v12 = SparkEntry.queries("v12_ann_recall_trained")(spark, dir)
      .collect().map(_.getAs[Long]("n_hit")).sum
    val v14 = SparkEntry.queries("v14_ann_recall_trained_multiprobe")(spark, dir)
      .collect().map(_.getAs[Long]("n_hit")).sum
    assert(curve(0)._2 == v12, s"nprobe=1 ${curve(0)._2} != v12 $v12")
    assert(curve(1)._2 == v14, s"nprobe=2 ${curve(1)._2} != v14 $v14")
    assert(curve.forall(_._3 == curve.head._3), "k differs across points")
  }

  test("q11: A-ES selection equals a driver-side recompute and skews toward long docs") {
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(_._3 > 0)
    val hashed = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        pmod(graft.queries.Portable.portableHash(
          concat(lit("q11|"), col("doc_id").cast("string"))), lit(1000000L)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def key(id: Long, w: Long): Long = {
      val u = (hashed(id) + 1).toDouble / 1000001.0
      BigDecimal(math.log(u) / w.toDouble * 1000000000L)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      ds.sortBy(d => (-key(d._1, d._3), d._1)).take(20).toSeq
    }.map(d => (d._1, d._2)).toSet
    val got = SparkEntry.queries("q11_weighted_sample")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang")))
    assert(got.toSet == expected, s"selection diverged: ${got.toSet.diff(expected)}")
    // length-weighting must bind: the sampled mean length beats the
    // corpus mean (deterministic on the fixed fixture + fixed hash)
    val sampledMean = got.map(g => docs.find(_._1 == g._1).get._3).sum.toDouble / got.length
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    assert(sampledMean > corpusMean,
      s"weighting did not bind: sampled $sampledMean vs corpus $corpusMean")
  }

  test("j13: deletion-neighborhood blocking finds exactly the brute-force distance-1 pairs") {
    val vocab = {
      val base = graft.engine.Tables(spark, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")) >= 3 && length(col("w")) <= 15 &&
          col("w").rlike("^[a-z]+$"))
        .groupBy(col("w")).agg(count(lit(1)).as("f")).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val typos = base.filter(_._1.length >= 4)
        .map { case (w, _) => (w.substring(0, 1) + w.substring(2)) -> 1L }
      (base ++ typos).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val ws = vocab.keys.toSeq.sorted
    val expected = (for {
      i <- ws.indices; j <- (i + 1) until ws.length
      if lev(ws(i), ws(j)) == 1
    } yield (ws(i), ws(j), vocab(ws(i)), vocab(ws(j)))).toSet
    val got = SparkEntry.queries("j13_fuzzy_join")(spark, dir).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("f1"), r.getAs[Long]("f2"))).toSet
    assert(got == expected,
      s"missing: ${expected.diff(got)}; extra: ${got.diff(expected)}")
    assert(got.nonEmpty, "seeding failed to produce any distance-1 pair")
  }

  test("g33: the 4-round frontier equals a driver-side BFS and distances are tight") {
    val edges = SparkEntry.queries("g09_mobility_od")(spark, dir)
      .where(col("src") =!= "0" && col("dst") =!= "0" && col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct().collect()
      .flatMap(r => Seq(r.getString(0) -> r.getString(1), r.getString(1) -> r.getString(0)))
      .toSet
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val seed = edges.map(_._1).min
    var dist = Map(seed -> 0L)
    for (k <- 1 to 4) {
      val frontier = dist.filter(_._2 == k - 1).keys
      frontier.foreach { r =>
        adj.getOrElse(r, Set.empty).foreach { n =>
          if (!dist.contains(n)) dist += n -> k.toLong
        }
      }
    }
    val got = SparkEntry.queries("g33_bfs_hops")(spark, dir).collect()
      .map(r => r.getAs[String]("region") -> r.getAs[Long]("dist")).toMap
    assert(got == dist, s"missing: ${dist.toSet.diff(got.toSet)}; extra: ${got.toSet.diff(dist.toSet)}")
    // every non-seed distance is witnessed by a neighbor one hop closer
    got.filter(_._2 > 0).foreach { case (r, d) =>
      assert(adj(r).exists(n => got.get(n).contains(d - 1)), s"$r at $d has no witness")
    }
  }

  test("s14: merged-schema read fills exactly the v1 rows with NULLs") {
    // the oracle equates "value IS NULL after mergeSchema" with
    // "user_id % 2 = 0" — valid ONLY while the fixture has no NULL
    // value and no negative user_id (Scala % is signed). Assert both
    // invariants so a fixture regeneration that breaks them fails HERE
    // with a named cause, not as an opaque oracle hash mismatch.
    val fixtureGuard = graft.engine.Tables.events(spark, dir)
      .agg(sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null_value"),
        min(col("user_id")).as("min_uid")).collect()(0)
    assert(fixtureGuard.getLong(0) == 0L,
      "fixture drift: events.value now has NULLs — the s14 oracle's " +
        "'NULL iff v1 writer' equivalence no longer holds")
    assert(fixtureGuard.getLong(1) >= 0L,
      "fixture drift: events.user_id went negative — the s14 oracle's " +
        "user_id % 2 writer-split predicate no longer matches Spark's signed %")
    val rows = SparkEntry.queries("s14_schema_evolution")(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Long]("n_null")))
    val ev = graft.engine.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = ev.groupBy(_._1)
    assert(rows.map(_._1).toSet == byType.keySet)
    rows.foreach { case (tpe, n, nNull) =>
      assert(n == byType(tpe).length.toLong, s"$tpe count")
      assert(nNull == byType(tpe).count(_._2 % 2 == 0).toLong, s"$tpe null count")
      assert(nNull > 0 && nNull < n, s"$tpe: evolution did not bind")
    }
  }

  test("w11: cohort retention invariants hold and offset-0 is definitionally full") {
    val rows = SparkEntry.queries("w11_retention_cohorts")(spark, dir).collect()
      .map(r => (r.getAs[String]("cohort_week"), r.getAs[Long]("off"),
        r.getAs[Long]("n_active"), r.getAs[Long]("n_cohort"),
        r.getAs[Long]("retention_ppm")))
    assert(rows.nonEmpty)
    rows.foreach { case (_, off, nActive, nCohort, ppm) =>
      assert(nActive <= nCohort && nActive > 0, s"off $off")
      assert(ppm == nActive * 1000000 / nCohort, s"off $off ppm")
      if (off == 0L) assert(nActive == nCohort, "cohort not fully active at offset 0")
    }
    // per-cohort activity totals reconcile with the distinct user-week count
    val userWeeks = graft.engine.Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts"))).distinct().count()
    assert(rows.map(_._3).sum == userWeeks, "activity totals diverge")
  }

  test("t27: apply conserves the corpus and removes exactly t10's non-representatives") {
    val rows = SparkEntry.queries("t27_dedup_apply")(spark, dir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("n_removed")))
    rows.foreach { case (src, n, k, rm) => assert(k + rm == n, src) }
    val t10 = SparkEntry.queries("t10_dup_clusters")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("is_rep")))
    assert(rows.map(_._4).sum == t10.count(!_._2).toLong,
      "removed count diverges from t10's non-representatives")
    assert(rows.map(_._4).sum > 0, "the seeded duplicates did not remove anything")
  }

  test("g34: the z-score flags equal a driver-side recompute over the densified grid") {
    val flows = SparkEntry.queries("g09_mobility_od")(spark, dir)
      .where(col("src") =!= "0" && col("dst") =!= "0" && col("src") =!= col("dst"))
      .select(date_trunc("week", to_timestamp(col("hour"))).as("week"),
        col("src"), col("dst"), col("cnt"))
      .groupBy(col("week"), col("src"), col("dst")).agg(sum(col("cnt")).as("flow"))
      .collect().map(r => ((r.getTimestamp(0).getTime, r.getString(1),
        r.getString(2)), r.getLong(3)))
    val weeks = flows.map(_._1._1).distinct.sorted
    val corridors = flows.map(t => (t._1._2, t._1._3)).distinct
    val byKey = flows.toMap
    val expected = corridors.flatMap { case (srcRg, dstRg) =>
      val xs = weeks.map(w => byKey.getOrElse((w, srcRg, dstRg), 0L))
      val base = xs.dropRight(1); val x5 = xs.last
      val n = base.length.toDouble
      val sx = base.sum.toDouble; val sxx = base.map(x => x * x).sum.toDouble
      val sd = math.sqrt((n * sxx - sx * sx) / (n * (n - 1.0)))
      if (sd <= 0) None else {
        val z = BigDecimal((x5.toDouble - sx / n) / sd)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (math.abs(z) >= 2.0) Some(((srcRg, dstRg), (x5, z))) else None
      }
    }.toMap
    val got = SparkEntry.queries("g34_flow_anomaly")(spark, dir).collect()
      .map(r => ((r.getAs[String]("src"), r.getAs[String]("dst")),
        (r.getAs[Long]("x5"), r.getAs[Double]("z")))).toMap
    assert(got == expected,
      s"missing ${expected.keySet.diff(got.keySet)}; extra ${got.keySet.diff(expected.keySet)}")
    assert(weeks.length == 5, s"fixture week grid changed: ${weeks.length}")
  }

  test("q12: the DP release applies exactly the documented Laplace mechanism") {
    // the judged artifact carries ONLY (region, released) — the true
    // count must never appear in the release (r9 advisor). Recompute n
    // here, independently, to verify the mechanism.
    val released = SparkEntry.queries("q12_dp_release")(spark, dir).collect()
      .map(r => r.getAs[String]("region") -> r.getAs[Long]("released")).toMap
    assert(!SparkEntry.queries("q12_dp_release")(spark, dir)
      .columns.contains("n"), "the true count leaked into the release")
    val trueN = graft.engine.Tables(spark, dir, "events")
      .select(graft.functions.GeoFunctions.geohashCol(
        graft.queries.Portable.latFromKey(
          graft.queries.Portable.fixKey(col("user_id"), col("ts"))),
        graft.queries.Portable.lonFromKey(
          graft.queries.Portable.fixKey(col("user_id"), col("ts"))), 3).as("region"),
        col("user_id"))
      .distinct().groupBy("region").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = released.toSeq.map { case (region, rel) => (region, trueN(region), rel) }
    assert(rows.nonEmpty)
    val hashes = spark.createDataFrame(rows.map(r => Tuple1(r._1)).toSeq)
      .toDF("region")
      .select(col("region"), pmod(graft.queries.Portable.portableHash(
        concat(lit("q12|"), col("region"))), lit(1000000L)).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var nonzeroNoise = 0
    rows.foreach { case (region, n, released) =>
      val t = ((hashes(region).toDouble + 0.5) / 1000000.0) - 0.5
      val noise = if (t >= 0) -2.0 * math.log(1.0 - 2.0 * t)
        else 2.0 * math.log(1.0 + 2.0 * t)
      val expected = math.max(0L, n + BigDecimal(noise)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      assert(released == expected, s"$region: $released vs $expected")
      if (released != n) nonzeroNoise += 1
    }
    assert(nonzeroNoise > 0, "the mechanism never perturbed anything")
  }

  test("v28: the greedy chain equals a driver-side farthest-point recompute; radii non-increasing") {
    val embs = graft.engine.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).sortBy(_._1)
    def d2us(a: Array[Float], b: Array[Float]): Long = {
      var s = 0.0; var i = 0
      while (i < 64) {
        val d = a(i).toDouble - b(i).toDouble; s += d * d; i += 1
      }
      BigDecimal(s * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    var centers = Vector((1L, embs.head._1, 0L))
    var dmin = embs.map { case (id, e) => id -> d2us(e, embs.head._2) }.toMap
    val byId = embs.toMap
    for (k <- 2 to 6) {
      val (pid, pd) = dmin.toSeq.sortBy { case (id, d) => (-d, id) }.head
      centers :+= ((k.toLong, pid, pd))
      val ce = byId(pid)
      dmin = dmin.map { case (id, d) => id -> math.min(d, d2us(byId(id), ce)) }
    }
    val got = SparkEntry.queries("v28_kcenter_coreset")(spark, dir).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("center_id"),
        r.getAs[Long]("radius_us"))).toVector.sortBy(_._1)
    assert(got == centers, s"got $got expected $centers")
    // coverage radius can only shrink as centers are added
    got.drop(1).sliding(2).foreach {
      case Vector(a, b) => assert(b._3 <= a._3, s"radius grew: $a -> $b")
      case _ =>
    }
    assert(got.map(_._2).distinct.length == 6, "a center repeated")
  }

  test("t28: model scoring equals a driver-side sigmoid recompute and the gate discriminates") {
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.map { case (lang, text) =>
      val words = text.split(" ", -1)
      val nw = words.length.toDouble
      val swr = words.count(stop.contains).toDouble / nw
      val mwl = (text.length - (words.length - 1)).toDouble / nw
      val score = -1.0 + 20.0 * swr + 0.1 * (mwl - 4.5)
      val p6 = BigDecimal(1.0 / (1.0 + math.exp(-score)) * 1000000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      (lang, p6)
    }
    val byLang = expected.groupBy(_._1)
    val got = SparkEntry.queries("t28_quality_model")(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("avg_p_ppm")))
    assert(got.map(_._1).toSet == byLang.keySet)
    got.foreach { case (lang, n, kept, avg) =>
      val ps = byLang(lang).map(_._2)
      assert(n == ps.length.toLong, s"$lang n")
      assert(kept == ps.count(_ >= 500000L).toLong, s"$lang kept")
      assert(avg == ps.sum / ps.length, s"$lang avg")
      // the gate must actually separate: neither everything nor nothing
      assert(kept > 0 && kept < n, s"$lang gate degenerate: $kept/$n")
    }
  }

  test("g35: the commute matrix is consistent with the judged g06 home anchors") {
    val homes = SparkEntry.queries("g06_home_region")(spark, dir).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[String]("home_region")).toMap
    // recompute the work anchor driver-side from the completed trajectory
    val traj = graft.engine.Trajectory
      .complete(graft.engine.Tables.events(spark, dir))
      .select(col("user_id"), hour(col("hour")).as("h"), col("region")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val works = traj.filter(t => t._2 >= 10 && t._2 <= 16)
      .groupBy(_._1).view.mapValues { rows =>
        rows.groupBy(_._3).toSeq.map { case (rg, g) => (rg, g.length) }
          .sortBy { case (rg, c) => (-c, rg) }.head._1
      }.toMap
    val expected = homes.keySet.intersect(works.keySet).toSeq
      .map(u => (homes(u), works(u))).filter { case (h, w) => h != w }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("g35_commute_matrix")(spark, dir).collect()
      .map(r => ((r.getAs[String]("home"), r.getAs[String]("work")),
        r.getAs[Long]("n_commuters"))).toMap
    assert(got == expected,
      s"missing ${expected.keySet.diff(got.keySet)}; extra ${got.keySet.diff(expected.keySet)}")
    assert(got.values.sum > 0, "no commuters — the day/night split did not bind")
  }

  test("a18: every bucket's min/max sit inside its exact power-of-two range") {
    val rows = SparkEntry.queries("a18_log_histogram")(spark, dir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("bucket"),
        r.getAs[Long]("n"), r.getAs[Long]("min_v100"), r.getAs[Long]("max_v100")))
    assert(rows.nonEmpty)
    rows.foreach { case (tpe, b, n, mn, mx) =>
      assert((1L << b) <= mn + 1 && mx + 1 < (1L << (b + 1)),
        s"$tpe bucket $b: [$mn, $mx] outside [${(1L << b) - 1}, ${(1L << (b + 1)) - 2}]")
      assert(n > 0 && mn <= mx, s"$tpe bucket $b")
    }
    val total = graft.engine.Tables.events(spark, dir).count()
    assert(rows.map(_._3).sum == total, "histogram does not partition the events")
  }

  test("v29: the MMR chain equals a driver-side greedy recompute and diversity binds") {
    val embs = graft.engine.Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosUs(a: Array[Float], b: Array[Float]): Long = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < 64) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      val c = BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      BigDecimal(c * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val q = embs(10L)
    val cand = embs.toSeq.filter(_._1 != 10L)
      .map { case (id, e) => (id, e, cosUs(q, e)) }
      .sortBy { case (id, _, r) => (-r, id) }.take(50)
    var state = cand.map { case (id, e, r) => (id, e, r, 0L) }
    val expected = (1 to 5).map { k =>
      val (pid, pe, prel, _) = state
        .map { case (id, e, r, sm) => (id, e, r, 7 * r - 3 * sm) }
        .sortBy { case (id, _, _, m) => (-m, id) }
        .map { case (id, e, r, m) => (id, e, r, m) }.head
      state = state.filter(_._1 != pid)
        .map { case (id, e, r, sm) => (id, e, r, math.max(sm, cosUs(pe, e))) }
      (k.toLong, pid, prel)
    }
    val got = SparkEntry.queries("v29_mmr_rerank")(spark, dir).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("rel_us"))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // diversity must bind: MMR's 5 picks differ from the pure-relevance
    // top-5 (otherwise the penalty term did nothing on this corpus)
    val pureTop5 = cand.take(5).map(_._1)
    assert(got.map(_._2) != pureTop5, "MMR degenerated to pure relevance")
  }

  test("f16: the date spine is contiguous, dow cycles, and counts conserve the corpus") {
    val fmt = new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val rows = SparkEntry.queries("f16_date_spine")(spark, dir).collect()
      .map(r => (fmt.parse(r.getAs[String]("day")).getTime / 1000,
        r.getAs[Long]("dow"), r.getAs[Long]("n")))
    assert(rows.length >= 2)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._1 - a._1 == 86400L, s"spine gap: ${a._1} -> ${b._1}")
        assert(b._2 == (a._2 + 1) % 7, s"dow broke: ${a._2} -> ${b._2}")
      case _ =>
    }
    val total = graft.engine.Tables.events(spark, dir).count()
    assert(rows.map(_._3).sum == total, "spine counts do not conserve the corpus")
  }

  test("w09: folds are 1..5, equal-depth within ±1, and partition each language exactly") {
    val langTotals = graft.engine.Tables(spark, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("w09_ntile_folds")(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("fold"), r.getAs[Long]("n_docs")))
    rows.groupBy(_._1).foreach { case (lang, fs) =>
      assert(fs.map(_._2).sorted.toSeq == (1L to math.min(5L, langTotals(lang))).toSeq, lang)
      assert(fs.map(_._3).sum == langTotals(lang), lang)
      val sizes = fs.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang folds unbalanced: ${fs.toSeq}")
    }
    assert(rows.map(_._1).toSet == langTotals.keySet)
  }
}
