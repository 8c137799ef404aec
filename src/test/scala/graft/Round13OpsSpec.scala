package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Semantics checks for the round-13 additions. */
class Round13OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Collect BatchScanExec nodes across AQE query-stage boundaries
    * (plain `collect` stops at QueryStageExec wrappers). */
  private def ledgerScans(p: SparkPlan): Seq[BatchScanExec] = {
    val here = p match {
      case b: BatchScanExec if b.scan.description().contains("graft-ledger") => Seq(b)
      case _ => Nil
    }
    val nested = p match {
      case q: QueryStageExec => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Nil
    }
    here ++ (p.children ++ nested).flatMap(ledgerScans)
  }

  test("s20: runtime join filters prune ledger files in the PLANNED query") {
    val df = SparkEntry.queries("s20_ledger_runtime_skip")(spark, dir)
    // the dim's min-per-lang keys all exist in the fact — inner join keeps
    // one row per dim key
    assert(df.collect().length == 5)
    val scans = ledgerScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    val scan = scans.head
    // the planner injected the DPP subquery on the V2 scan (not just the
    // unit-driven contract of LedgerSourceSpec)
    assert(scan.runtimeFilters.nonEmpty, scan.toString)
    // and it BOUND: the fact was written as 8 disjoint doc_id range files,
    // the dim's keys are min-ids clustered in the low ranges — the executed
    // scan must have planned strictly fewer partitions than files exist
    assert(scan.inputRDD.getNumPartitions < 8,
      s"no file was pruned: ${scan.inputRDD.getNumPartitions} partitions planned")
  }

  test("g40: assigned regions flow through the whole pipeline (sentinel stays distinct)") {
    val out = SparkEntry.queries("g40_pipeline")(spark, dir)
      .select(col("src"), col("dst"), col("frac")).collect()
    assert(out.nonEmpty)
    val regions = out.flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
    // regions are assigned agent ids (nation+1 → "1".."25") plus the
    // shared sentinel "0"; a raw geohash cell leaking through the cascade
    // would show up as a non-numeric region
    assert(regions.contains("0"), "sentinel region absent — gap-fill exits lost")
    assert(regions.forall(r => r.forall(_.isDigit)), s"non-assigned region in $regions")
    assert((regions - "0").nonEmpty, "no fix matched the dictionary at any precision")
    // fractions are presence-normalized: never negative, and a row with a
    // positive count against a zero/absent population pins to 0
    assert(out.forall(_.getDouble(2) >= 0.0))
  }

  test("v32: the dedup stage evicts every seeded twin and ONLY the twins") {
    // the pipeline's dedup is hash-observable because a surviving twin
    // (cos = 1.0 with its query, same bucket and cell) would surface as
    // the query's rank-1 neighbor — this pins the stage directly: the
    // seeded frame carried base + 10 twins, the survivor frame must be
    // exactly the base corpus
    val nBase = spark.read.parquet(s"$dir/embeddings.parquet").count()
    val sv = graft.queries.VectorQueries.pipelineSurvivors(spark, dir)
    assert(sv.count() == nBase, "an original was evicted or a twin survived")
    assert(sv.where(col("vec_id") >= 1000000000000L).count() == 0,
      "a seeded twin survived dedup")
    // queries and centroid seeds are among the survivors (the index and
    // the probe set are built on the deduped corpus, not despite it)
    assert(sv.where(col("vec_id") < 20).count() == 20)
  }

  test("st20: the waves partition the fixture and the top-5 list mixes waves") {
    // the recovery claim is non-vacuous only if (a) both lifetimes see
    // data and (b) for some user the true top-5 event times span BOTH
    // waves — then a lost ListState provably changes topk_sum, and a
    // lost MapState changes n_types wherever a type appears only in
    // wave 0
    import org.apache.spark.sql.expressions.Window
    val ev = graft.engine.Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
        pmod(graft.queries.Portable.portableHash(col("event_id").cast("string")),
          lit(2)).as("half"))
    val halves = ev.groupBy(col("half")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(halves.getOrElse(0L, 0L) > 0 && halves.getOrElse(1L, 0L) > 0,
      s"waves do not partition: $halves")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc)
    val mixed = ev.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5)
      .groupBy(col("user_id"))
      .agg(countDistinct(col("half")).as("nh"))
      .where(col("nh") === 2).count()
    assert(mixed > 0, "no user's top-5 event times span both waves")
  }

  test("st21: the bootstrap state is visible in the judged output") {
    // if handleInitialState were skipped, every emitted field would
    // cover the streamed half only — pin users whose output can ONLY be
    // explained by seeded state: n_types exceeding the streamed half's
    // distinct types (MapState seeded with prefix-only types) and
    // topk_n = 5 for users with fewer than 5 streamed events (ListState
    // seeded with prefix times)
    import org.apache.spark.sql.expressions.Window
    val half = pmod(graft.queries.Portable.portableHash(
      col("event_id").cast("string")), lit(2))
    val ev1 = graft.engine.Tables.events(spark, dir).where(half === 1)
      .select(col("user_id").cast("long").as("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("es").desc)
    val w1top = ev1.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5).groupBy(col("user_id"))
      .agg(sum(col("es")).as("w1_top5"))
    val w1 = ev1.groupBy(col("user_id"))
      .agg(count(lit(1)).as("w1_events"))
      .join(w1top, Seq("user_id"))
    val out = SparkEntry.queries("st21_initial_state")(spark, dir)
    val joined = out.join(w1, Seq("user_id")).collect()
    assert(joined.nonEmpty)
    // n_events is the fold of the MapState counters inside the processor,
    // so exceeding the streamed half's row count proves the map was seeded
    assert(joined.exists(r => r.getLong(2) > r.getLong(5)),
      "no user's n_events exceeds the streamed half's — MapState seeding unobservable")
    assert(joined.exists(r => r.getLong(3) > r.getLong(6)),
      "no user's top-5 sum exceeds the streamed half's — ListState seeding unobservable")
  }

  test("g41: the recursive CTE reproduces a driver-side bounded BFS exactly") {
    // the edge set is region-bounded, so a driver recompute is cheap and
    // total: BFS from the min-id seed, depth <= 3, must equal the judged
    // recursion row-for-row (this is the semantic pin; the catalog row
    // pins Spark-vs-DuckDB on the same SQL)
    val out = SparkEntry.queries("g41_recursive_reach")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val edges = spark.table("g41_edges").collect()
      .map(r => r.getString(0) -> r.getString(1))
    val seed = edges.map(_._1).min
    var dist = Map(seed -> 0L)
    for (d <- 0L until 3L)
      for ((s0, d0) <- edges if dist.get(s0).contains(d))
        if (!dist.contains(d0)) dist += d0 -> (d + 1)
    assert(out == dist, s"recursion ${out.size} rows vs BFS ${dist.size}")
    assert(out(seed) == 0L)
    assert(out.values.max <= 3L)
  }

  test("_metadata file columns expose lineage without a custom source") {
    // the hidden _metadata struct is the built-in provenance channel
    // (which file produced each row) — free on every file source, no
    // custom connector needed; row_index restarts per file so the
    // per-file max+1 must reconstruct the table's row count exactly
    val tmp = graft.queries.Portable.scratchPath("r13_meta")
    graft.engine.Tables.events(spark, dir)
      .repartition(3).write.mode("overwrite").parquet(tmp)
    val m = spark.read.parquet(tmp)
      .select(col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("ri"))
    assert(m.select(countDistinct(col("fp"))).collect()(0).getLong(0) == 3)
    val reconstructed = m.groupBy(col("fp")).agg(max(col("ri")).as("mx"))
      .agg(sum(col("mx") + 1)).collect()(0).getLong(0)
    assert(reconstructed == spark.read.parquet(tmp).count())
  }

  test("f18: under ANSI the non-try forms throw where try_* degrades to NULL") {
    // the other half of f18's contract: ANSI is ON in this engine (the
    // Spark 4 default), so the same expressions WITHOUT try_ must kill
    // the job on the first failing row — if this starts passing ANSI
    // was turned off somewhere and f18 is no longer testing anything
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val ev = graft.engine.Tables.events(spark, dir).limit(100)
    intercept[Exception] {
      ev.selectExpr("CAST(event_type AS BIGINT)").collect()
    }
    intercept[Exception] {
      ev.selectExpr("9223372036854775807L + user_id").where(col("user_id") > 0).collect()
    }
    // and the try_ forms run the SAME rows to completion
    val ok = ev.selectExpr("try_cast(event_type AS BIGINT) AS c",
      "try_add(9223372036854775807L, user_id) AS o").collect()
    assert(ok.length == 100)
  }

  test("observe: pipeline metrics ride the job as a plan node, no second scan") {
    // Dataset.observe is the production data-quality hook: row counts and
    // checksums accumulate INSIDE the job (a CollectMetrics node), not as
    // a second pass over the input — sum(user_id) is an exact BIGINT so
    // the assertion is bit-deterministic
    val obs = new org.apache.spark.sql.Observation(
      s"r13_obs_${System.nanoTime()}")
    val ev = graft.engine.Tables.events(spark, dir)
      .select(col("user_id").cast("long").as("user_id"), col("event_type"))
    val observed = ev.observe(obs, count(lit(1)).as("rows"),
      sum(col("user_id")).as("sum_uid"))
    val grouped = observed.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
    val m = obs.get
    assert(m("rows") == grouped.map(_.getLong(1)).sum,
      s"observed row count ${m("rows")} != job output total")
    val direct = ev.agg(sum(col("user_id"))).collect()(0).getLong(0)
    assert(m("sum_uid") == direct, "observed checksum != direct aggregate")
    val p = ev.observe(s"r13_obs2_${System.nanoTime()}", count(lit(1)).as("rows"))
      .groupBy(col("event_type")).count()
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(p.contains("CollectMetrics"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("v32: probe rows never contain twin ids and recall is well-formed") {
    val out = SparkEntry.queries("v32_pipeline")(spark, dir).collect()
    assert(out.length == 30, s"expected 10 queries x 3 ranks, got ${out.length}")
    assert(out.forall(_.getLong(2) < 1000000000000L),
      "a twin id reached the judged probe output")
    assert(out.forall { r =>
      val nHit = r.getLong(4); val k = r.getLong(5)
      nHit >= 0 && nHit <= k && k == 3
    })
  }
}
