package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the round-5 pipeline-widening operators
  * (q07 mixture sampler, t18 span dedup, v15 semantic dedup). */
class Round5bOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q07: the sampled mixture is balanced across languages") {
    val docs = graft.engine.Tables(spark, dir, "documents")
    val minLang = docs.groupBy(col("lang")).count()
      .agg(min(col("count"))).collect()(0).getLong(0)
    val sampled = SparkEntry.queries("q07_mixture_sample")(spark, dir)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled.size == 5, s"expected all 5 languages represented: $sampled")
    val (lo, hi) = (sampled.values.min, sampled.values.max)
    // each stratum targets minLang docs in expectation; the hash sampler's
    // per-stratum deviation is binomial — generous ±25% bounds hold at
    // every SF while still failing on any systematic skew
    assert(hi <= (minLang * 1.25).toLong + 1, s"over-sampled stratum: $sampled (min=$minLang)")
    assert(lo >= (minLang * 0.75).toLong - 1, s"under-sampled stratum: $sampled (min=$minLang)")
  }

  test("t18: seed twins dedup to empty and span mass is conserved") {
    val out = SparkEntry.queries("t18_line_dedup")(spark, dir)
      .select(col("doc_id"), col("kept_text"), col("n_kept"), col("n_tot"))
      .persist()
    // every twin (doc_id >= 1e12) is a verbatim copy of an earlier doc —
    // sub-document dedup must strip it entirely
    val twins = out.where(col("doc_id") >= 1000000000000L)
    assert(twins.count() == 10)
    assert(twins.where(col("kept_text") =!= "" || col("n_kept") =!= 0).count() == 0,
      "a twin survived sub-document dedup")
    // conservation: exactly one copy of every distinct span survives
    val docs = graft.engine.Tables(spark, dir, "documents")
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .unionByName(docs.where(col("doc_id") < 10)
        .select((col("doc_id") + 1000000000000L).as("doc_id"),
          split(col("text"), " ").as("ws")))
    val nDistinct = base.select(posexplode(transform(
        sequence(lit(0L), ceil(size(col("ws")).cast("double") / 10.0).cast("long") - 1),
        i => array_join(slice(col("ws"), (i * 10 + 1).cast("int"), lit(10)), " ")))
        .as(Seq("i", "span")))
      .agg(countDistinct(col("span"))).collect()(0).getLong(0)
    val keptSum = out.agg(sum(col("n_kept"))).collect()(0).getLong(0)
    assert(keptSum == nDistinct, s"kept $keptSum spans, expected $nDistinct distinct")
    out.unpersist()
  }

  test("v15: semantic dedup evicts exactly the scaled twins, keeping their originals") {
    val rows = SparkEntry.queries("v15_semantic_dedup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(rows.length == 10, s"expected the 10 twins, got ${rows.length} evictions")
    rows.foreach { case (vecId, keeper, cos) =>
      assert(vecId >= 1000000000000L, s"a corpus vector $vecId was evicted")
      assert(keeper == vecId - 1000000000000L,
        s"twin $vecId kept by $keeper, not its original")
      assert(cos == 1.0, s"twin $vecId scored $cos against its original")
    }
  }

  test("st11: outer join emits nulls for provably-unmatched rows and holds back the tail") {
    import org.apache.spark.sql.functions.expr
    val out = SparkEntry.queries("st11_stream_outer_join")(spark, dir).persist()
    val nNull = out.agg(sum(col("n_null"))).collect()(0).getLong(0)
    assert(nNull > 0, "no null rows emitted — outer semantics not exercised")
    // batch ground truth: every unmatched purchase, with no watermark cutoff
    val ev = graft.engine.Tables.events(spark, dir)
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val unmatchedAll = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
          col("c_ts") <= col("p_ts"), "left_anti").count()
    assert(nNull < unmatchedAll,
      s"all $unmatchedAll unmatched purchases were emitted — the watermark held nothing, " +
        "so the query no longer demonstrates streaming state retention")
    out.unpersist()
  }

  test("t19: consecutive chunks overlap by exactly the stride") {
    val ch = SparkEntry.queries("t19_chunk_overlap")(spark, dir)
      .select(col("doc_id"), col("chunk_id"), split(col("chunk_text"), " ").as("cw"))
      .persist()
    val pairs = ch.as("a").join(ch.as("b"),
      col("a.doc_id") === col("b.doc_id") &&
        col("b.chunk_id") === col("a.chunk_id") + 1)
    val total = pairs.count()
    assert(total > 0, "no consecutive chunk pairs — docs too short for the window")
    // when chunk i is full (16 words), its back half is chunk i+1's front half
    val bad = pairs
      .where(size(col("a.cw")) === 16 &&
        !(slice(col("a.cw"), 9, 8) === slice(col("b.cw"), 1, 8)))
      .count()
    assert(bad == 0, s"$bad consecutive chunk pairs do not share their stride overlap")
    ch.unpersist()
  }

  test("a17: count-min never underestimates and is exact for collision-free keys") {
    val rows = SparkEntry.queries("a17_countmin_freq")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (u, exact, est) =>
      assert(est >= exact, s"user $u: CMS estimated $est below true count $exact")
    }
    // with 64 buckets × 4 rows some keys must escape every collision
    assert(rows.exists { case (_, exact, est) => est == exact },
      "no key estimated exactly — hash family degenerate?")
  }

  test("g25: radius of gyration is 0 for a single-site user and positive otherwise") {
    val s2 = spark
    import s2.implicits._
    val rg = SparkEntry.queries("g25_radius_of_gyration")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    // users visiting ≥2 distinct sites must disperse; all-one-site users sit at 0
    val sites = graft.engine.Tables.events(spark, dir)
      .select($"user_id", get_json_object($"props", "$.k").cast("long").as("k"))
      .groupBy($"user_id").agg(countDistinct($"k").as("n_sites"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    sites.foreach { case (u, n) =>
      if (n >= 2) assert(rg(u) > 0.0, s"user $u visits $n sites but rg=0")
      else assert(rg(u) == 0.0, s"single-site user $u has rg=${rg(u)}")
    }
  }

  test("t20: every pipeline stage binds and the final corpus is balanced") {
    val docs = graft.engine.Tables(spark, dir, "documents")
    val nRaw = docs.count()
    val out = SparkEntry.queries("t20_clean_corpus")(spark, dir).persist()
    val n = out.count()
    assert(n > 0 && n < nRaw, s"pipeline kept $n of $nRaw — no stage bound")
    val perLang = out.groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.size == 5, s"missing languages: $perLang")
    val (lo, hi) = (perLang.values.min, perLang.values.max)
    assert(hi <= (lo * 1.3).toLong + 1, s"final mixture skewed: $perLang")
    out.unpersist()
  }

  test("g24: a user's stays are disjoint, time-ordered intervals") {
    val rows = SparkEntry.queries("g24_stay_points")(spark, dir)
      .select(col("user_id"), col("stay_start"), col("stay_end"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.nonEmpty, "no stays detected")
    rows.groupBy(_._1).foreach { case (u, ss) =>
      ss.foreach { case (_, a, b) => assert(a <= b, s"user $u stay $a > $b") }
      ss.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e0), (_, s1, _)) =>
          assert(e0 < s1, s"user $u has overlapping stays ($e0 vs $s1)")
        case _ =>
      }
    }
  }

  test("TopKPerKey: edge semantics match the window form (ties, short groups, k ≥ group)") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // group a: 4 rows with a tie on v; group b: 1 row (< k); group c: exactly k
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 30.0), ("a", 4L, 20.0),
      ("b", 5L, 7.0),
      ("c", 6L, 2.0), ("c", 7L, 1.0), ("c", 8L, 3.0)
    ).toDF("g", "id", "v").repartition(3) // multiple maps exercise the partial pass
    val got = graft.operators.TopKPerKey(df, Seq("g"), Seq(("v", false), ("id", true)), 3)
      .select($"g", $"rn", $"id", $"v")
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id".asc)
    val want = df.withColumn("rn", row_number().over(w)).where($"rn" <= 3)
      .select($"g", $"rn".cast("long").as("rn"), $"id", $"v")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"got ${got.collect().toSeq.sortBy(_.toString)} want ${want.collect().toSeq.sortBy(_.toString)}")
  }
}
