package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantics checks for the round-4c operators (CDC merge, dataset
  * profiling, perceptual-hash dedup), cross-validated against
  * independent formulations at sf0.001. */
class Round4cOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("u03: max_by compaction equals the window row_number form") {
    val s = spark
    import s.implicits._
    val base = graft.engine.Tables(spark, dir, "customer")
      .select($"c_custkey".as("user_id"), lit("base").as("state"),
        round($"c_acctbal", 2).as("val"), lit(-1L).as("seq"),
        lit("base").as("src"))
    val delta = graft.engine.Tables.events(spark, dir)
      .select($"user_id", $"event_type".as("state"),
        round($"value", 2).as("val"), $"event_id".as("seq"),
        lit("delta").as("src"))
    val w = Window.partitionBy($"user_id").orderBy($"seq".desc)
    val windowForm = base.unionByName(delta)
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1 && $"state" =!= "error")
      .select($"user_id", $"state", $"val", $"src")
      .orderBy($"user_id")
    val got = SparkEntry.queries("u03_upsert_merge")(spark, dir)
    assert(got.collect().toSeq == windowForm.collect().toSeq)
  }

  test("u03: a tombstone deletes only when it is the last op for the key") {
    val s = spark
    import s.implicits._
    // last event per user straight from the log
    val last = graft.engine.Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(max_by($"event_type", $"event_id").as("last_type"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val kept = SparkEntry.queries("u03_upsert_merge")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    last.foreach { case (u, t) =>
      if (t == "error") assert(!kept.contains(u), s"user $u: last op is a tombstone but survived")
      else assert(kept.contains(u), s"user $u: last op '$t' should survive")
    }
    // base-only keys (never touched by the log) always survive
    val baseOnly = graft.engine.Tables(spark, dir, "customer")
      .select($"c_custkey").collect().map(_.getLong(0)).toSet -- last.keySet
    assert(baseOnly.nonEmpty && baseOnly.forall(kept.contains))
  }

  test("q05: profile metrics equal direct aggregates") {
    val d = graft.engine.Tables(spark, dir, "documents")
    val got = SparkEntry.queries("q05_profile")(spark, dir)
      .collect().map { case Row(c: String, m: String, v: Double) => (c, m) -> v }.toMap
    assert(got(("_table", "n_rows")) == d.count().toDouble)
    assert(got(("doc_id", "n_distinct")) == d.select("doc_id").distinct().count().toDouble)
    assert(got(("lang", "n_distinct")) == d.select("lang").distinct().count().toDouble)
    assert(got(("n_chars", "min")) == d.agg(min("n_chars")).head().getLong(0).toDouble)
    assert(got(("n_chars", "max")) == d.agg(max("n_chars")).head().getLong(0).toDouble)
  }

  test("g20: degree-oriented count equals brute-force triangle enumeration") {
    val s = spark
    import s.implicits._
    val edges = graft.engine.Trajectory
      .transitions(graft.engine.Trajectory.hourlyState(graft.engine.Tables.events(spark, dir)))
      .where($"src" =!= $"dst" && $"src" =!= "0" && $"dst" =!= "0")
      .select(least($"src", $"dst"), greatest($"src", $"dst"))
      .distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val adj = edges.foldLeft(Map.empty[String, Set[String]]) { case (m, (a, b)) =>
      m.updated(a, m.getOrElse(a, Set.empty) + b).updated(b, m.getOrElse(b, Set.empty) + a)
    }
    val verts = adj.keys.toSeq.sorted
    var brute = 0L
    for (a <- verts; b <- adj(a) if a < b; c <- adj(a) if b < c && adj(b).contains(c))
      brute += 1
    val got = SparkEntry.queries("g20_triangle_count")(spark, dir)
      .head().getLong(0)
    assert(got == brute, s"oriented count $got != brute force $brute")
  }

  test("t16/t17: the seeded straddling twins are flagged at every SF") {
    // seeds 0 and 9 land in the test split while their identical-text
    // twins (doc_id + 1e12) land in train — both decontamination forms
    // must flag them regardless of scale factor
    val exact = SparkEntry.queries("t16_decontaminate")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    assert(Set(0L, 9L).subsetOf(exact), s"t16 flagged $exact")
    val fuzzy = SparkEntry.queries("t17_ngram_decontaminate")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(fuzzy.get(0L).contains(1.0) && fuzzy.get(9L).contains(1.0),
      s"t17 flagged $fuzzy")
  }

  test("m06: every pair is genuinely Hamming-close and every exact-dup pair in an uncapped bucket is found") {
    val s = spark
    import s.implicits._
    // reference phash per doc, computed driver-side (independent loop
    // structure over the same DCT table the query emits into its oracle)
    val dct = graft.queries.MultimodalQueries.DctTable
    val docs = graft.engine.Tables(spark, dir, "documents")
      .select($"doc_id", $"text").collect()
      .map { case Row(id: Long, t: String) =>
        val h = new Array[Long](64)
        t.foreach(c => h(c % 64) += 1)
        var sig = 0L
        for (k <- 1 to 60) {
          val d = (for (x <- 0 until 8; y <- 0 until 8)
            yield dct((k / 8) * 8 + x) * dct((k % 8) * 8 + y) * h(x * 8 + y)).sum
          if (d > 0) sig |= (1L << (k - 1))
        }
        id -> sig
      }.toMap
    val pairs = SparkEntry.queries("m06_phash_dedup")(spark, dir)
      .collect().map { case Row(a: Long, b: Long, hm: Long) => (a, b, hm) }
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, hm) =>
      val expect = java.lang.Long.bitCount(docs(a) ^ docs(b)).toLong
      assert(hm == expect && hm <= 3, s"pair ($a,$b): hamming $hm, reference $expect")
    }
    // identical phashes in a sub-cap bucket must all pair up (recall floor):
    // count docs per band value; for bucket sizes <= cap the pair set must
    // contain every equal-phash pair
    val cap = 64
    val byBand = docs.toSeq.flatMap { case (id, ph) =>
      (0 until 4).map(b => ((b, (ph >> (15 * b)) & 32767L), id))
    }.groupBy(_._1)
    val pairSet = pairs.map(p => (p._1, p._2)).toSet
    byBand.filter(_._2.size <= cap).foreach { case (_, members) =>
      val ids = members.map(_._2)
      for (a <- ids; b <- ids if a < b && docs(a) == docs(b))
        assert(pairSet.contains((a, b)), s"missed exact-dup pair ($a,$b)")
    }
  }
}
