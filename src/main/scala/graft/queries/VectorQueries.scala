package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables
import Portable._

/** Similarity search over `embeddings` (64-dim float vectors) — the
  * ANN operators of a training-data pipeline.
  *
  * - [[v01]] brute-force cosine top-k: the exact baseline. Query set ×
  *   corpus equi-free join — at 100 TB the corpus side stays partitioned
  *   and the (small) query set broadcasts; per-row work is a sequential
  *   fold inside codegen, no UDF.
  * - [[v02]] LSH-bucketed ANN: deterministic random-hyperplane signature
  *   → bucket equi-join. The scale path: candidates per query shrink by
  *   ~2^planes, and the join is a hash join on the bucket key, not a
  *   cross join.
  * - [[v03]] per-label centroids: array analytics via posexplode +
  *   scaled-long exact mean.
  *
  * All dot products are sequential index-order folds — the native
  * codegen'd `dot_fold` kernel, bit-parity-proven against the composed
  * HOF form and DuckDB's `list_reduce` by v06.
  */
object VectorQueries {
  type Q = (SparkSession, String) => DataFrame

  private val Dim = 64
  private val NPlanes = 4

  /** v21's prefix-truncation geometry: stage 1 folds only the first
    * [[MrlDim]] of [[Dim]] elements; the rerank set is [[Shortlist]]
    * rows per query. (Declared up here with [[Dim]]: the catalog's
    * oracle strings interpolate these at object-init time, so a
    * declaration after `catalog` would read as 0.) */
  private val MrlDim = 16
  private val Shortlist = 16

  /** Skew guard for the v04 pair-generating bucket self-join (the t06
    * `BandCap` pattern): a bucket holding n vectors makes n²/2 candidate
    * pairs, and the 8-plane bucket space is FIXED (256 values), so at
    * 100 TB the average bucket is ~n/256 and pair generation would go
    * quadratic without a bound. Buckets over the cap drop from pair
    * generation entirely (deterministic, mirrored in the oracle via
    * QUALIFY) — ≤ BucketCap² pairs per bucket at any corpus size. Far
    * above anything the judged SFs produce, so judged output is
    * unchanged there; VectorDedupSpec pins the binding behavior. */
  private val BucketCap = 256L

  /** Per-pair dot product through the native codegen'd expression
    * (`graft.functions.DotFold` — a tight JVM loop inside whole-stage
    * codegen) instead of the interpreted `aggregate(zip_with(...))` HOF
    * (~µs/element of expression-tree walking, the dominant per-candidate
    * cost at 100 TB). Same IEEE ops in the same index order — v06 judges
    * the native form against the composed-form oracle. */
  private def dotNative(a: Column, b: Column): Column =
    call_function("dot_fold", a, b)

  private def cosine(a: Column, b: Column): Column =
    round(dotNative(a, b) / (sqrt(dotNative(a, a)) * sqrt(dotNative(b, b))), 6)

  private def cosineSql(a: String, b: String): String =
    s"round(${dotFoldSql(a, b, Dim)} / (sqrt(${dotFoldSql(a, a, Dim)}) * sqrt(${dotFoldSql(b, b, Dim)})), 6)"

  /** Norm precomputed once per vector: the pair loop then costs ONE fold
    * instead of three (dot(a,a)/dot(b,b) re-derived per pair). Same double
    * ops in the same order as [[cosine]] — judged values are identical. */
  private def normCol(e: Column): Column = sqrt(dotNative(e, e))
  private def normSql(e: String): String = s"sqrt(${dotFoldSql(e, e, Dim)})"
  private def cosPre(dot: Column, na: Column, nb: Column): Column =
    round(dot / (na * nb), 6)
  private def cosPreSql(dot: String, na: String, nb: String): String =
    s"round($dot / ($na * $nb), 6)"

  /** Deterministic pseudo-random hyperplane component: plane j, index i
    * (1-based) → integer in [-48, 48]. Exact in both engines. Native
    * codegen'd expression (`graft.functions.PlaneDot`); [[planeDotHof]]
    * keeps the interpreted composed form for the v06 parity proof. */
  private def planeDot(emb: Column, j: Int): Column =
    call_function("plane_dot", emb, lit(j))

  private def planeDotHof(emb: Column, j: Int): Column =
    aggregate(
      transform(sequence(lit(1), lit(Dim)),
        i => element_at(emb, i).cast("double") * ((lit(j) * 37 + i * 101) % 97 - 48).cast("double")),
      lit(0.0), (acc, x) => acc + x)

  private def planeDotSql(emb: String, j: Int): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(generate_series(1, $Dim), i -> CAST($emb[CAST(i AS INT)] AS DOUBLE) * CAST(($j * 37 + i * 101) % 97 - 48 AS DOUBLE))), (acc, x) -> acc + x)"

  private def bucketCol(emb: Column, nPlanes: Int = NPlanes): Column =
    (0 until nPlanes).map { j =>
      when(planeDot(emb, j) >= 0, lit(1L << j)).otherwise(0L)
    }.reduce(_ + _)

  private def bucketSql(emb: String, nPlanes: Int = NPlanes): String =
    (0 until nPlanes).map { j =>
      s"(CASE WHEN ${planeDotSql(emb, j)} >= 0 THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")

  /** v16 product-quantization geometry: [[Dim]] = [[NSub]] × [[SubDim]]
    * subspaces, 8 codes per subspace. */
  private val NSub = 8
  private val SubDim = 8

  /** Squared L2 between two [[SubDim]]-length slices — sequential
    * index-order fold of exact IEEE ops (subtract, multiply, add): the
    * two engines produce bit-identical doubles, so v16's micro-unit
    * rounding is exact, not approximately-matched. */
  private def subD2(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)

  /** DuckDB twin of [[subD2]] over full embedding lists at element
    * offset `off` (both sides use the SAME offset — a code's j-th
    * subvector lives at the same positions as the vector's); `n` is
    * the fold length ([[SubDim]] for subspaces, [[Dim]] for v17's
    * exact full-vector distance). */
  private def pqD2Sql(a: String, b: String, off: String, n: Int = SubDim): String = {
    val x = s"(CAST($a[CAST(i + $off AS INT)] AS DOUBLE) - CAST($b[CAST(i + $off AS INT)] AS DOUBLE))"
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(generate_series(1, $n), i -> $x * $x)), (acc, x) -> acc + x)"
  }

  /** One embedding → its [[NSub]] (j, subvector) slices. */
  private def subSlices(vcol: Column): Column = explode(array((0 until NSub).map(j =>
    struct(lit(j).as("j"), slice(vcol, j * SubDim + 1, SubDim).as("sub"))): _*))

  /** v16's PQ encode + ADC probe (seed codebook), the body of the v16
    * catalog entry: returns (q_id, rank, vec_id, adc_us), unordered —
    * judged callers add their own orderBy. */
  private def pqTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val codes = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("code_id"), subSlices(col("embedding")).as("e"))
      .select(col("e.j").as("j"), col("code_id"), col("e.sub").as("csub"))
    val subs = emb
      .select(col("vec_id"), subSlices(col("embedding")).as("e"))
      .select(col("vec_id"), col("e.j").as("j"), col("e.sub").as("sub"))
    val assigned = subs.join(broadcast(codes), Seq("j"))
      .groupBy(col("vec_id"), col("j"))
      .agg(min(struct(subD2(col("sub"), col("csub")).as("d2"), col("code_id"))).as("w"))
      .select(col("vec_id"), col("j"), col("w.code_id").as("code_id"))
    val qtab = emb.where(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), subSlices(col("embedding")).as("e"))
      .select(col("q_id"), col("e.j").as("j"), col("e.sub").as("qsub"))
      .join(broadcast(codes), Seq("j"))
      .select(col("q_id"), col("j"), col("code_id"),
        round(subD2(col("qsub"), col("csub")) * 1000000).cast("long").as("ql"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_us"), col("vec_id"))
    assigned.join(broadcast(qtab), Seq("j", "code_id"))
      .where(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("ql")).as("adc_us"))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= 5)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adc_us"))
  }

  /** Oracle CTE chain for the PQ ENCODE half — seed codebook (`codes`),
    * per-(vector, subspace) nearest-code assignment (`asg`) and the
    * query-side ADC lookup table (`qtab`) — shared by the v16/v17
    * oracles (via [[pqOracleCtes]]) and composed with [[ivfAssignCtes]]
    * by v19's IVFADC oracle. */
  private def pqEncodeCtes: String =
    s"""js AS (SELECT unnest(generate_series(0, ${NSub - 1})) AS j),
       |codes AS (
       |  SELECT js.j, vec_id AS code_id, embedding FROM embeddings, js
       |  WHERE vec_id < 8),
       |scored AS (
       |  SELECT e.vec_id, c.j, c.code_id,
       |         ${pqD2Sql("e.embedding", "c.embedding", s"c.j * $SubDim")} AS d2
       |  FROM embeddings e, codes c),
       |asg AS (
       |  SELECT vec_id, j, code_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id, j
       |              ORDER BY d2, code_id) AS rn
       |    FROM scored) WHERE rn = 1),
       |qtab AS (
       |  SELECT e.vec_id AS q_id, c.j, c.code_id,
       |         CAST(round(${pqD2Sql("e.embedding", "c.embedding", s"c.j * $SubDim")} * 1000000, 0) AS BIGINT) AS ql
       |  FROM embeddings e, codes c
       |  WHERE e.vec_id >= 10 AND e.vec_id < 20)""".stripMargin

  /** Oracle CTE chain producing v16's (q_id, rank, vec_id, adc_us) as
    * `pq` — shared verbatim by the v16 and v17 oracles. */
  private def pqOracleCtes: String =
    s"""$pqEncodeCtes,
       |score AS (
       |  SELECT q.q_id, a.vec_id, CAST(sum(q.ql) AS BIGINT) AS adc_us
       |  FROM asg a JOIN qtab q ON q.j = a.j AND q.code_id = a.code_id
       |  WHERE a.vec_id <> q.q_id GROUP BY 1, 2),
       |pq AS (
       |  SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, adc_us FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY adc_us, vec_id) AS rank
       |    FROM score) WHERE rank <= 5)""".stripMargin

  /** Squared-L2 fold between a full embedding at offset `offA` and a
    * codebook subvector list at offset 0 — the DuckDB twin of
    * [[subD2]](slice, csub) for v17's trained codebooks, whose centroid
    * lists are [[SubDim]]-long (unlike [[pqD2Sql]], where both sides are
    * full embeddings sharing one offset). */
  private def trainedD2Sql(a: String, offA: String, c: String): String = {
    val x = s"(CAST($a[CAST(i + $offA AS INT)] AS DOUBLE) - CAST($c[CAST(i AS INT)] AS DOUBLE))"
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(generate_series(1, $SubDim), i -> $x * $x)), (acc, x) -> acc + x)"
  }

  /** The corpus's (vec_id, j, sub) subvector rows — shared by every
    * stage of the trained-PQ pipeline (seed assignment, re-encode,
    * query table), so computed once and cached. */
  private def pqSubs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), subSlices(col("embedding")).as("e"))
      .select(col("vec_id"), col("e.j").as("j"), col("e.sub").as("sub"))
      .persist()

  /** Nearest-code assignment of every (vector, subspace) against a
    * (j, code_id, csub) codebook: ONE hash agg with map-side combine —
    * `min(struct(d2, code_id))` is the deterministic tie-break; the
    * subvector rides along for the training step (constant per group,
    * so `first` is value-deterministic). */
  private def pqAssign(subs: DataFrame, codebook: DataFrame): DataFrame =
    subs.join(broadcast(codebook), Seq("j"))
      .groupBy(col("vec_id"), col("j"))
      .agg(min(struct(subD2(col("sub"), col("csub")).as("d2"), col("code_id"))).as("w"),
        first(col("sub")).as("sub"))
      .select(col("vec_id"), col("j"), col("w.code_id").as("code_id"),
        col("w.d2").as("d2"), col("sub"))

  /** One Lloyd step per subspace (the v11 recipe composed per subspace,
    * exactly as SURVEY §2.11 promised): each (subspace, code) centroid
    * becomes the EXACT mean of its assigned subvectors — scaled-long
    * sums so the two engines agree bit-for-bit, then one double
    * division. Codes that attract no vectors drop out (mirrored in the
    * oracle: the training join only sees assigned codes). */
  private def pqTrainCodebook(asg0: DataFrame): DataFrame =
    asg0.select(col("j"), col("code_id"), posexplode(col("sub")).as(Seq("pos", "v")))
      .groupBy(col("j"), col("code_id"), col("pos"))
      .agg(sum(round(col("v").cast("double") * 1000000).cast("long")).as("sv"),
        count(lit(1)).as("n"))
      .select(col("j"), col("code_id"), col("pos"),
        ((col("sv").cast("double") / 1000000.0) / col("n").cast("double")).as("mv"))
      .groupBy(col("j"), col("code_id"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
      .select(col("j"), col("code_id"),
        transform(col("pm"), x => x.getField("mv")).as("csub"))

  /** Seed + trained assignments with their distances, for the Lloyd
    * monotonicity spec (one training step must not increase total
    * quantization distortion). */
  private[graft] def pqAssignments(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val subs = pqSubs(s, dir)
    val codes0 = Tables(s, dir, "embeddings").where(col("vec_id") < 8)
      .select(col("vec_id").as("code_id"), subSlices(col("embedding")).as("e"))
      .select(col("e.j").as("j"), col("code_id"), col("e.sub").as("csub"))
    val asg0 = pqAssign(subs, codes0).persist()
    (asg0, pqAssign(subs, pqTrainCodebook(asg0)))
  }

  /** v32's dedup stage, exposed for the spec that pins its
    * observability: ingest seeded with 2×-scaled twins of the query ids
    * (10..19, offset +10^12 — same hyperplane bucket and IVF cell as
    * their originals by exact exponent shift / cosine scale-invariance,
    * cos = 1.0), then v04's near-dup eviction (8-plane bucket self-join
    * under the [[BucketCap]] guard, cos ≥ 0.9, keep-min-id anti-join).
    * Returns the PERSISTED survivor frame (vec_id, embedding, nrm) —
    * the pipeline's barrier, consumed by the centroid seed, the
    * assignment fact and the exact baseline. */
  private[graft] def pipelineSurvivors(s: SparkSession, dir: String): DataFrame = {
    val base = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
    val seeded = base.unionByName(
      base.where(col("vec_id") >= 10 && col("vec_id") < 20)
        .select((col("vec_id") + 1000000000000L).as("vec_id"),
          transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
    val wBucket = Window.partitionBy(col("bucket"))
    val bucketed = seeded
      .select(col("vec_id"), col("embedding"),
        bucketCol(col("embedding"), 8).as("bucket"),
        normCol(col("embedding")).as("nrm"))
      .withColumn("nb", count(lit(1)).over(wBucket))
      .where(col("nb") <= BucketCap).drop("nb")
      .persist() // pair self-join (×2) + survivor anti-join
    val dups = bucketed.as("a").join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket")
          && col("a.vec_id") < col("b.vec_id"))
      .where(cosPre(dotNative(col("a.embedding"), col("b.embedding")),
        col("a.nrm"), col("b.nrm")) >= 0.9)
      .select(col("b.vec_id").as("vec_id")).distinct()
    bucketed.join(dups, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .persist() // centroid seed + assignment fact + exact corpus
  }

  /** Seed-quantizer assignment (persisted — probed twice: query side +
    * cell side): nearest-of-8 centroid by cosine, centroids = the 8
    * lowest-id vectors (deterministic seed set). Carries `label` through
    * so the inverted lists store the filter metadata beside each vector
    * — the filtered-search layout (v30): a metadata predicate applies
    * inside the cell scan without a side lookup join. */
  private[graft] def seedAssigned(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
    val cents = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id").asc)
    emb.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("embedding"), col("cent")))
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"),
        normCol(col("embedding")).as("nrm"), col("label"))
      .persist()
  }

  /** v33/v34 shared FROZEN-QUANTIZER assignment: score `corpus` against
    * the deterministic 8-centroid seed set (broadcast, O(k) rows) and
    * keep each vector's best cell. Per-vector assignment is
    * deterministic, which is exactly what makes maintained ≡ rebuilt
    * judgeable; retraining is the documented offline path (v11). */
  private[queries] def frozenAssign(emb: DataFrame)(corpus: DataFrame): DataFrame = {
    val cents = emb.where(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id").asc)
    corpus.crossJoin(broadcast(cents))
      .withColumn("ccos", cosine(col("embedding"), col("cent")))
      .withColumn("rn", row_number().over(wAssign))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"),
        col("cent_id").as("cell"), normCol(col("embedding")).as("nrm"),
        col("label"))
  }

  /** v33/v34 shared oracle: the full re-assignment of the FINAL corpus
    * (base slice minus the retention delete, plus the ingest wave)
    * under the same frozen quantizer, probed by v05's chain. Both
    * maintenance paths (v33's simulated deltas, v34's real change
    * feed) must land exactly here. */
  private[queries] def incrementalIvfOracleSql: String =
    s"""WITH corpus2 AS (
       |  SELECT vec_id, embedding, label FROM embeddings
       |  WHERE ((vec_id % 3 <> 2 OR vec_id < 20)
       |         AND NOT (vec_id % 5 = 0 AND vec_id >= 20))
       |     OR (vec_id % 3 = 2 AND vec_id >= 20)),
       |cents AS (
       |  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
       |  WHERE vec_id < 8),
       |cscored AS (
       |  SELECT e.vec_id, e.embedding, e.label, c.cent_id,
       |         ${cosineSql("e.embedding", "c.cent")} AS ccos
       |  FROM corpus2 e, cents c),
       |assigned AS (
       |  SELECT vec_id, embedding, cent_id AS cell,
       |         ${normSql("embedding")} AS nrm, label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |              ORDER BY ccos DESC, cent_id ASC) AS rn
       |    FROM cscored) WHERE rn = 1),
       |${ivfProbeCtes("assigned", "iq", "cand", "ivf")}
       |SELECT q_id, rank, vec_id, cos
       |FROM ivf ORDER BY q_id, rank""".stripMargin

  /** Unique catalog/scratch roots per v34 invocation — the change-feed
    * interval is addressed by absolute commit ids (see t33's twin). */
  private val v34Invocation = new java.util.concurrent.atomic.AtomicInteger(0)

  /** The IVF probe over any (vec_id, embedding, cell, nrm) assignment:
    * query set = vec_id 10..19, probe the query's cell only, top-3 by
    * cosine (ties broken by vec_id). Unordered — judged callers add
    * their own orderBy. */
  private[queries] def probeTopK(assigned: DataFrame): DataFrame = {
    val queries = assigned.where(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("cell"), col("nrm").as("q_nrm"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    // the query set is tiny by construction — broadcast it so the probe
    // is a broadcast hash join on the cell key and the corpus side never
    // shuffles (statically; AQE would only discover this at runtime)
    broadcast(queries).join(assigned, Seq("cell")) // probe the query's cell only
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
        col("q_nrm"), col("nrm")))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }

  /** v05's IVF probe, shared with the v10 recall evaluation. */
  private def ivfTopK(s: SparkSession, dir: String): DataFrame =
    probeTopK(seedAssigned(s, dir))

  /** Labels admitted by the v30/v31 filtered search — two of ten
    * roughly-balanced labels, a ~20% metadata slice. */
  private val FilterLabels: Seq[Int] = Seq(2, 5)

  /** v30's filtered IVF probe: v05's single-cell probe with the
    * metadata predicate applied to the inverted list BEFORE any
    * distance math — PRE-filtering, the semantics a filtered vector
    * search must have (post-filtering an unfiltered top-3 silently
    * returns fewer, or worse, admissible neighbors). The predicate
    * rides the persisted assignment — labels are stored inside the
    * lists (see [[seedAssigned]]) — so the probe stays one broadcast
    * hash join on the cell key and a selective predicate SHRINKS the
    * per-cell candidate set: the filter composes with the index
    * instead of fighting it. Queries keep their unfiltered cell
    * assignment (the query vector need not satisfy its own filter). */
  private def filteredTopK(s: SparkSession, dir: String): DataFrame = {
    val assigned = seedAssigned(s, dir)
    val corpus = assigned.where(col("label").isin(FilterLabels: _*))
    val queries = assigned.where(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("cell"), col("nrm").as("q_nrm"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(queries).join(corpus, Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
        col("q_nrm"), col("nrm")))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("label"), col("cos"))
  }

  /** v31: recall@3 of the filtered probe against the exact filtered
    * brute force — the ground truth is top-3 AMONG ADMISSIBLE vectors
    * (judging filtered-ANN against unfiltered truth would mark every
    * correctly-filtered answer wrong). k comes from the exact side, so
    * a query whose cell ran dry of admissible candidates scores an
    * honest partial recall rather than vanishing. */
  private def filteredRecall(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"),
        normCol(col("embedding")).as("nrm"))
    val qs = emb.where(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val corpus = emb.where(col("label").isin(FilterLabels: _*))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val exact = broadcast(qs).crossJoin(corpus)
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
        col("q_nrm"), col("nrm")))
      .withColumn("rank", row_number().over(wq))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("vec_id"))
    val hits = filteredTopK(s, dir).select(col("q_id"), col("vec_id"))
      .join(exact, Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    exact.groupBy(col("q_id")).agg(count(lit(1)).as("k"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("k"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("k").cast("double"), 4)
          .as("recall"))
      .orderBy(col("q_id"))
  }

  /** One deterministic Lloyd iteration over the seed assignment (v11):
    * per-cell exact elementwise mean via scaled longs (the judged v03
    * recipe — both engines sum identical BIGINTs, divide identically),
    * then re-assign every vector to its nearest TRAINED centroid.
    * Centroid-side products use the composed double fold
    * ([[Portable.dotFold]] ↔ DuckDB list_reduce) because the trained
    * centroids are exact doubles — the native float-array kernel would
    * narrow them; vector-side norms keep the native form. Every seed
    * cell is non-empty (a seed vector's cosine with itself is 1), so 8
    * trained centroids always exist. */
  private def trainedRanked(s: SparkSession, dir: String): DataFrame = {
    val a0 = seedAssigned(s, dir)
    val cents1 = a0
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(sum(round(col("v").cast("double") * 1000000).cast("long")).as("sv"),
        count(lit(1)).as("n"))
      .select(col("cell"), col("pos"),
        ((col("sv").cast("double") / 1000000.0) / col("n").cast("double")).as("mv"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
      .select(col("cell").as("cent_id"),
        transform(col("pm"), x => x.getField("mv")).as("cent"))
      .withColumn("cnrm", sqrt(Portable.dotFold(col("cent"), col("cent"))))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("ccos").desc, col("cent_id").asc)
    a0.select(col("vec_id"), col("embedding"), col("nrm"))
      .crossJoin(broadcast(cents1))
      .withColumn("ccos",
        round(Portable.dotFold(col("embedding"), col("cent")) / (col("nrm") * col("cnrm")), 6))
      .withColumn("rn", row_number().over(wAssign))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("cent_id"), col("rn"))
      .persist() // rn=1 is the cell assignment; rn<=2 is the probe set
  }

  private def trainedAssigned(s: SparkSession, dir: String): DataFrame =
    trainedRanked(s, dir).where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"), col("nrm"))

  /** Trained quantizer + v07's two-cell multi-probe — the documented
    * cure for v12's measured single-probe recall regression: probing
    * the query's two nearest TRAINED cells recovers the neighbors that
    * re-assignment moved one cell over. */
  private def trainedMultiProbe(s: SparkSession, dir: String): DataFrame = {
    val ranked = trainedRanked(s, dir)
    val assigned = ranked.where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"), col("nrm"))
    val probes = ranked
      .where(col("vec_id") >= 10 && col("vec_id") < 20 && col("rn") <= 2)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("cent_id").as("cell"), col("nrm").as("q_nrm"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(probes).join(assigned, Seq("cell"))
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
        col("q_nrm"), col("nrm")))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }

  /** v10's recall@3 evaluation over any probe result — exact side =
    * broadcast queries × corpus (the v01 shape), recall = matched/3. */
  private def recallOf(approx: DataFrame, s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), normCol(col("embedding")).as("nrm"))
    val qs = emb.where(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("nrm").as("q_nrm"))
    val wq = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val exact = broadcast(qs).crossJoin(emb)
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
        col("q_nrm"), col("nrm")))
      .withColumn("rank", row_number().over(wq))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("vec_id"))
    val hits = approx.select(col("q_id"), col("vec_id"))
      .join(exact, Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
    exact.groupBy(col("q_id")).agg(count(lit(1)).as("k"))
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("k"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("k").cast("double"), 4)
          .as("recall"))
      .orderBy(col("q_id"))
  }

  /** Oracle CTEs producing the seed assignment as `assigned`. */
  private def ivfAssignCtes: String =
    s"""cents AS (
       |  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings WHERE vec_id < 8),
       |cscored AS (
       |  SELECT e.vec_id, e.embedding, e.label, c.cent_id,
       |         ${cosineSql("e.embedding", "c.cent")} AS ccos
       |  FROM embeddings e, cents c),
       |assigned AS (
       |  SELECT vec_id, embedding, cent_id AS cell,
       |         ${normSql("embedding")} AS nrm, label FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |              ORDER BY ccos DESC, cent_id ASC) AS rn
       |    FROM cscored) WHERE rn = 1)""".stripMargin

  /** Oracle CTEs for the probe over assignment `asg`, emitting `out`. */
  private def ivfProbeCtes(asg: String, iq: String, cand: String, out: String): String =
    s"""$iq AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, cell, nrm AS q_nrm
       |  FROM $asg WHERE vec_id >= 10 AND vec_id < 20),
       |$cand AS (
       |  SELECT $iq.q_id, e.vec_id,
       |         ${cosPreSql(dotFoldSql(s"$iq.q_emb", "e.embedding", 64), s"$iq.q_nrm", "e.nrm")} AS cos
       |  FROM $iq JOIN $asg e ON $iq.cell = e.cell AND e.vec_id <> $iq.q_id),
       |$out AS (
       |  SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY cos DESC, vec_id ASC) AS rank
       |    FROM $cand) WHERE rank <= 3)""".stripMargin

  /** Oracle CTE chain producing v05's (q_id, rank, vec_id, cos) as `ivf`
    * — shared verbatim by the v05 and v10 oracles. */
  private def ivfOracleCtes: String =
    s"""$ivfAssignCtes,
       |${ivfProbeCtes("assigned", "iq", "cand", "ivf")}""".stripMargin

  /** Oracle CTEs for the one-Lloyd-iteration trained quantizer (v11/v12):
    * per-cell scaled-long exact mean (the v03 recipe) → `assigned1`. */
  private def ivfTrainedCtes: String =
    s"""cmean AS (
       |  SELECT cell, i AS pos,
       |    (CAST(sum(CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000.0)
       |      / CAST(count(*) AS DOUBLE) AS mv
       |  FROM assigned, (SELECT unnest(generate_series(1, $Dim)) AS i)
       |  GROUP BY 1, 2),
       |cent1 AS (
       |  SELECT cell AS cent_id, list(mv ORDER BY pos) AS cent FROM cmean GROUP BY 1),
       |cent1n AS (
       |  SELECT cent_id, cent, sqrt(${dotFoldSql("cent", "cent", Dim)}) AS cnrm FROM cent1),
       |cscored1 AS (
       |  SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
       |         round(${dotFoldSql("e.embedding", "c.cent", Dim)} / (e.nrm * c.cnrm), 6) AS ccos
       |  FROM assigned e, cent1n c),
       |ranked1 AS (
       |  SELECT vec_id, embedding, nrm, cent_id,
       |         row_number() OVER (PARTITION BY vec_id
       |                            ORDER BY ccos DESC, cent_id ASC) AS rn
       |  FROM cscored1),
       |assigned1 AS (
       |  SELECT vec_id, embedding, cent_id AS cell, nrm
       |  FROM ranked1 WHERE rn = 1)""".stripMargin

  /** Oracle CTEs for the two-cell multi-probe over the trained
    * assignment (v13/v14): probe set = rn ≤ 2 of `ranked1`. */
  private def ivfTrainedMultiProbeCtes: String =
    s"""iq2 AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, cent_id AS cell, nrm AS q_nrm
       |  FROM ranked1 WHERE vec_id >= 10 AND vec_id < 20 AND rn <= 2),
       |cand2 AS (
       |  SELECT iq2.q_id, e.vec_id,
       |         ${cosPreSql(dotFoldSql("iq2.q_emb", "e.embedding", 64), "iq2.q_nrm", "e.nrm")} AS cos
       |  FROM iq2 JOIN assigned1 e ON iq2.cell = e.cell AND e.vec_id <> iq2.q_id),
       |ivf2 AS (
       |  SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY cos DESC, vec_id ASC) AS rank
       |    FROM cand2) WHERE rank <= 3)""".stripMargin

  /** SQL form of the [[FilterLabels]] metadata predicate. */
  private def filterLabelsSql(col: String): String =
    s"$col IN (${FilterLabels.mkString(", ")})"

  /** Oracle CTEs for the v30 FILTERED probe over `assigned` (which
    * carries `label` — see [[ivfAssignCtes]]), emitting `fivf`: the
    * label predicate lands on the inverted-list side of the cell join
    * (pre-filtering), queries keep their unfiltered cell assignment —
    * the exact twin of [[filteredTopK]]. */
  private def filteredProbeCtes: String =
    s"""fq AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, cell, nrm AS q_nrm
       |  FROM assigned WHERE vec_id >= 10 AND vec_id < 20),
       |fcand AS (
       |  SELECT fq.q_id, e.vec_id, e.label,
       |         ${cosPreSql(dotFoldSql("fq.q_emb", "e.embedding", 64), "fq.q_nrm", "e.nrm")} AS cos
       |  FROM fq JOIN assigned e ON fq.cell = e.cell AND e.vec_id <> fq.q_id
       |  WHERE ${filterLabelsSql("e.label")}),
       |fivf AS (
       |  SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, label, cos FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY cos DESC, vec_id ASC) AS rank
       |    FROM fcand) WHERE rank <= 3)""".stripMargin

  /** Oracle tail computing recall@3 of the filtered probe vs the exact
    * FILTERED brute force — ground truth is top-3 among ADMISSIBLE
    * vectors only (the [[filteredRecall]] contract). */
  private def filteredRecallTailSql: String =
    s"""e AS (
       |  SELECT vec_id, embedding, label, ${normSql("embedding")} AS nrm FROM embeddings),
       |bq AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM e
       |  WHERE vec_id >= 10 AND vec_id < 20),
       |bscored AS (
       |  SELECT bq.q_id, e.vec_id,
       |         ${cosPreSql(dotFoldSql("bq.q_emb", "e.embedding", 64), "bq.q_nrm", "e.nrm")} AS cos
       |  FROM bq, e WHERE e.vec_id <> bq.q_id AND ${filterLabelsSql("e.label")}),
       |fexact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY cos DESC, vec_id ASC) AS rank
       |    FROM bscored) WHERE rank <= 3),
       |fhits AS (
       |  SELECT i.q_id, count(*) AS n_hit
       |  FROM fivf i WHERE EXISTS (
       |    SELECT 1 FROM fexact x WHERE x.q_id = i.q_id AND x.vec_id = i.vec_id)
       |  GROUP BY i.q_id),
       |fks AS (SELECT q_id, count(*) AS k FROM fexact GROUP BY q_id)
       |SELECT fks.q_id, CAST(coalesce(fhits.n_hit, 0) AS BIGINT) AS n_hit,
       |       CAST(fks.k AS BIGINT) AS k,
       |       round(CAST(coalesce(fhits.n_hit, 0) AS DOUBLE) / CAST(fks.k AS DOUBLE), 4) AS recall
       |FROM fks LEFT JOIN fhits ON fks.q_id = fhits.q_id
       |ORDER BY fks.q_id""".stripMargin

  /** Oracle tail computing recall@3 of probe CTE `ivfName` vs exact. */
  private def recallTailSql(ivfName: String): String =
    s"""e AS (
       |  SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
       |bq AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM e
       |  WHERE vec_id >= 10 AND vec_id < 20),
       |bscored AS (
       |  SELECT bq.q_id, e.vec_id,
       |         ${cosPreSql(dotFoldSql("bq.q_emb", "e.embedding", 64), "bq.q_nrm", "e.nrm")} AS cos
       |  FROM bq, e WHERE e.vec_id <> bq.q_id),
       |exact AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY cos DESC, vec_id ASC) AS rank
       |    FROM bscored) WHERE rank <= 3),
       |hits AS (
       |  SELECT i.q_id, count(*) AS n_hit
       |  FROM $ivfName i WHERE EXISTS (
       |    SELECT 1 FROM exact x WHERE x.q_id = i.q_id AND x.vec_id = i.vec_id)
       |  GROUP BY i.q_id),
       |ks AS (SELECT q_id, count(*) AS k FROM exact GROUP BY q_id)
       |SELECT ks.q_id, CAST(coalesce(hits.n_hit, 0) AS BIGINT) AS n_hit,
       |       CAST(ks.k AS BIGINT) AS k,
       |       round(CAST(coalesce(hits.n_hit, 0) AS DOUBLE) / CAST(ks.k AS DOUBLE), 4) AS recall
       |FROM ks LEFT JOIN hits ON ks.q_id = hits.q_id
       |ORDER BY ks.q_id""".stripMargin

  val catalog: Seq[(String, Q, String)] = Seq(

    // ── brute-force cosine top-k (exact ANN baseline) ──
    ("v01_cosine_topk",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), normCol(col("embedding")).as("nrm"))
        val queries = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("nrm").as("q_nrm"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)
        broadcast(queries).crossJoin(emb)
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= 5)
          .select(col("q_id"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("cos"))
          .orderBy(col("q_id"), col("rank"))
      },
      s"""WITH e AS (
         |  SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM e WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, e.vec_id,
         |         ${cosPreSql(dotFoldSql("q.q_emb", "e.embedding", 64), "q.q_nrm", "e.nrm")} AS cos
         |  FROM q, e WHERE e.vec_id <> q.q_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |            ORDER BY cos DESC, vec_id ASC) AS rank
         |  FROM scored)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos
         |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),

    // ── LSH-bucketed ANN: hyperplane signature → bucket hash join ──
    ("v02_ann_lsh",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"),
            bucketCol(col("embedding")).as("bucket"), normCol(col("embedding")).as("nrm"))
        val queries = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("bucket"), col("nrm").as("q_nrm"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)
        broadcast(queries)
          .join(emb, Seq("bucket"))
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= 3)
          .select(col("q_id"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("cos"))
          .orderBy(col("q_id"), col("rank"))
      },
      s"""WITH b AS (
         |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket,
         |         ${normSql("embedding")} AS nrm FROM embeddings),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS q_emb, bucket, nrm AS q_nrm
         |  FROM b WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, e.vec_id,
         |         ${cosPreSql(dotFoldSql("q.q_emb", "e.embedding", 64), "q.q_nrm", "e.nrm")} AS cos
         |  FROM q JOIN b e ON q.bucket = e.bucket AND e.vec_id <> q.q_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |            ORDER BY cos DESC, vec_id ASC) AS rank
         |  FROM scored)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos
         |FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin),

    // ── embedding-cosine near-dup: LSH bucket join → cosine ≥ 0.9 pairs
    //    (the vector-space member of the dedup family; both engines use
    //    the same buckets, so the judged pair set is identical) ──
    ("v04_dedup_cosine",
      (s: SparkSession, dir: String) => {
        // 8 planes (256 buckets): near-identical vectors still collide,
        // and the pair count drops ~16x vs the 4-plane search buckets.
        // The synthetic embeddings are near-orthogonal (no natural pair
        // clears cos >= 0.9), so the corpus is SEEDED with a 2x-scaled
        // copy of each vec_id < 10: scaling a float by 2 is an exact
        // exponent shift, so the copy lands in the same hyperplane bucket
        // (every planeDot term doubles, signs unchanged) and scores
        // cos = 1.0 — the judged pair set (i, i + 10^12) is non-empty
        // (offset far above any plausible natural vec_id, so seeds can
        // never collide with corpus ids at any scale)
        // by construction at every SF.
        val base = Tables(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val seeded = base.unionByName(
          base.where(col("vec_id") < 10)
            .select((col("vec_id") + 1000000000000L).as("vec_id"),
              transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
        val wBucket = Window.partitionBy(col("bucket"))
        val emb = seeded
          .select(col("vec_id"), col("embedding"),
            bucketCol(col("embedding"), 8).as("bucket"),
            normCol(col("embedding")).as("nrm"))
          // [[BucketCap]] hot-bucket guard: rides the bucket shuffle the
          // self-join needs anyway, bounds pair generation at scale
          .withColumn("nb", count(lit(1)).over(wBucket))
          .where(col("nb") <= BucketCap).drop("nb")
          .persist() // self-joined: 8 plane signatures + norm computed once
        emb.as("a").join(emb.as("b"),
            col("a.bucket") === col("b.bucket")
              && col("a.vec_id") < col("b.vec_id"))
          .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
            cosPre(dotNative(col("a.embedding"), col("b.embedding")),
              col("a.nrm"), col("b.nrm")).as("cos"))
          .where(col("cos") >= 0.9)
          .orderBy(col("vec_a"), col("vec_b"))
      },
      s"""WITH seeded AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000000000, list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
         |  FROM embeddings WHERE vec_id < 10),
         |b AS (
         |  SELECT vec_id, embedding, ${bucketSql("embedding", 8)} AS bucket,
         |         ${normSql("embedding")} AS nrm FROM seeded
         |  QUALIFY count(*) OVER (PARTITION BY bucket) <= $BucketCap)
         |SELECT vec_a, vec_b, cos FROM (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |         ${cosPreSql(dotFoldSql("a.embedding", "b.embedding", 64), "a.nrm", "b.nrm")} AS cos
         |  FROM b a JOIN b b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |WHERE cos >= 0.9 ORDER BY vec_a, vec_b""".stripMargin),

    // ── IVF-style ANN: coarse quantizer (8 fixed centroids) → cell
    //    assignment → probe only the query's cell (nprobe=1). The scale
    //    path beyond v02: candidate count shrinks by ~n_cells and the
    //    probe is a hash join on the cell id ──
    ("v05_ann_ivf",
      (s: SparkSession, dir: String) => ivfTopK(s, dir)
        .orderBy(col("q_id"), col("rank")),
      s"""WITH $ivfOracleCtes
         |SELECT q_id, rank, vec_id, cos
         |FROM ivf ORDER BY q_id, rank""".stripMargin),

    // ── v33: INCREMENTAL IVF INDEX MAINTENANCE — t31's state algebra
    //    applied to the ANN side, and exactly how production IVF
    //    systems run: the quantizer is FROZEN (trained offline, here
    //    the deterministic 8-centroid seed set) and the index absorbs
    //    corpus changes by DELTA ASSIGNMENT — removed vectors filtered
    //    out of the persisted inverted lists, added vectors assigned by
    //    crossing ONLY the Δ against the 8 broadcast centroids (O(Δ·k)
    //    work; the surviving corpus is never re-scored). The judged
    //    rows are v05's probe run over the MAINTAINED lists against the
    //    oracle's full re-assignment of the final corpus under the SAME
    //    frozen centroids — per-vector assignment is deterministic, so
    //    maintained ≡ rebuilt is exactly the claim (centroid retraining
    //    is the documented offline path, v11's Lloyd step). At 100 TB
    //    this is the difference between an embedding-index refresh that
    //    costs the day's delta and one that costs the corpus. ──
    ("v33_incremental_ivf",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
        // centroids (ids < 8) and queries (10..19) stay in every state
        val inCorpus1 = pmod(col("vec_id"), lit(3)) =!= 2 ||
          col("vec_id") < 20
        val statePath = scratchPath("v33_ivf_state")
        frozenAssign(emb)(emb.where(inCorpus1))
          .write.mode("overwrite").parquet(statePath)           // build
        val adds = emb.where(pmod(col("vec_id"), lit(3)) === 2 &&
          col("vec_id") >= 20)
        // ── MAINTENANCE: list filter + Δ assignment, nothing else ──
        val maintained = s.read.parquet(statePath)
          .where(!(pmod(col("vec_id"), lit(5)) === 0 &&
            col("vec_id") >= 20))
          .unionByName(frozenAssign(emb)(adds))
          .persist()
        probeTopK(maintained).orderBy(col("q_id"), col("rank"))
      },
      incrementalIvfOracleSql),

    // ── v34: IVF MAINTENANCE FROM THE REAL CHANGE FEED — v33's state
    //    algebra driven by the connector's own CDC instead of a
    //    simulated-delta predicate (the t33 compose on the ANN side):
    //    the vector REGISTRY (key = vec_id) lives in a `mor=true`
    //    ledger table, the corpus changes through a MoR retention
    //    DELETE (tombstones, before-images intact) and an ingest
    //    append, and the inverted lists are maintained by folding
    //    `option("changesFrom", v)`: net-negative keys (the delete
    //    events' before-image retraction legs) anti-join the persisted
    //    lists; net-positive keys are the ONLY vectors assigned —
    //    fetched from the embedding store by a broadcast join whose
    //    build side derives from the feed, then crossed against the 8
    //    broadcast frozen centroids (O(Δ·k) scoring; the surviving
    //    corpus is never re-scored). Judged: v05's probe over the
    //    CDF-maintained lists against the oracle's full re-assignment
    //    of the final corpus under the same frozen quantizer — v33's
    //    oracle verbatim, pinning simulated-Δ and real-CDC maintenance
    //    to one rebuild identity. At 100 TB this is the embedding
    //    index that tracks a living lakehouse table at the cost of the
    //    day's delta. ──
    ("v34_ivf_cdf_maintenance",
      (s: SparkSession, dir: String) => {
        val inv = v34Invocation.incrementAndGet()
        val cat = s"graft_v34_$inv"
        s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
        s.conf.set(s"spark.sql.catalog.$cat.root",
          scratchPath(s"v34_catroot_$inv"))
        val emb = Tables(s, dir, "embeddings")
        val inCorpus1 = pmod(col("vec_id"), lit(3)) =!= 2 ||
          col("vec_id") < 20
        def registryRows(df: DataFrame): DataFrame = df
          .select(col("vec_id").as("doc_id"),
            col("label").cast("string").as("lang"),
            col("vec_id").as("n_chars"))
        // ── v1: the registry lands MoR; state built under the frozen
        //    quantizer ──
        registryRows(emb.where(inCorpus1))
          .writeTo(s"$cat.v34vecs").tableProperty("mor", "true").create()
        val statePath = scratchPath(s"v34_ivf_state_$inv")
        frozenAssign(emb)(emb.where(inCorpus1))
          .write.mode("overwrite").parquet(statePath)
        // ── v2: MoR retention delete; v3: the ingest wave ──
        s.sql(s"DELETE FROM $cat.v34vecs " +
          "WHERE doc_id % 5 = 0 AND doc_id >= 20")
        registryRows(emb.where(pmod(col("vec_id"), lit(3)) === 2 &&
            col("vec_id") >= 20))
          .writeTo(s"$cat.v34vecs").append()
        // ── MAINTENANCE: fold the LEDGER'S change feed, nothing else ──
        val tdir = new java.io.File(
          scratchPath(s"v34_catroot_$inv"), "v34vecs").getPath
        val net = s.read.format("graft-ledger")
          .option("changesFrom", "1").load(tdir)
          .groupBy(col("doc_id").as("vec_id"))
          .agg(sum(when(col("_change_type") === "insert", 1L)
            .otherwise(-1L)).as("net"))
          .persist() // ONE Changes scan feeds retraction + Δ-assign
        val delKeys = broadcast(net.where(col("net") < 0).select(col("vec_id")))
        val insKeys = net.where(col("net") > 0).select(col("vec_id"))
        val deltaVecs = emb.as("e")
          .join(broadcast(insKeys.as("k")),
            col("e.vec_id") === col("k.vec_id"))
          .select(col("e.vec_id"), col("e.embedding"), col("e.label"))
        val maintained = s.read.parquet(statePath)
          .join(delKeys, Seq("vec_id"), "left_anti")
          .unionByName(frozenAssign(emb)(deltaVecs))
          .persist()
        probeTopK(maintained).orderBy(col("q_id"), col("rank"))
      },
      incrementalIvfOracleSql),

    // ── v10: ANN quality evaluation IN-pipeline — recall@3 of the IVF
    //    probe (v05's exact chain, shared code) against the brute-force
    //    exact top-3 for the same query set. The eval an ANN deployment
    //    gates on, expressed as the same kind of judged relational
    //    query: exact side = broadcast queries × corpus (the v01 shape),
    //    approx side = ivfTopK, recall = matched/3 per query via a
    //    left-semi-style join on (q_id, vec_id). All-integer counts and
    //    a 1/3-grid fraction — deterministic across engines. ──
    ("v10_ann_recall",
      (s: SparkSession, dir: String) => recallOf(ivfTopK(s, dir), s, dir),
      s"""WITH $ivfOracleCtes,
         |${recallTailSql("ivf")}""".stripMargin),

    // ── v11: IVF with TRAINED centroids — one deterministic Lloyd
    //    iteration over the v05 seed set (assign → per-cell exact
    //    scaled-long mean → re-assign), then v05's probe verbatim. The
    //    quantizer-training slot of the ANN pipeline, exact in both
    //    engines: centroid components are the judged v03 mean recipe,
    //    and centroid-side dots run the composed double fold (DuckDB's
    //    list_reduce twin) so nothing narrows to float. At 100 TB the
    //    mean is one posexplode aggregation (map-side combinable) and
    //    the 8-row centroid table broadcasts — Lloyd cost is one extra
    //    corpus pass per iteration, no new shuffle shape. ──
    ("v11_ann_ivf_trained",
      (s: SparkSession, dir: String) => probeTopK(trainedAssigned(s, dir))
        .orderBy(col("q_id"), col("rank")),
      s"""WITH $ivfAssignCtes,
         |$ivfTrainedCtes,
         |${ivfProbeCtes("assigned1", "iq1", "cand1", "ivf1")}
         |SELECT q_id, rank, vec_id, cos
         |FROM ivf1 ORDER BY q_id, rank""".stripMargin),

    // ── v12: recall@3 of the TRAINED quantizer — v10's evaluation over
    //    v11's probe. Judged side-by-side with v10, the pair records
    //    in-pipeline whether Lloyd training actually bought recall —
    //    which is exactly why the eval exists: training monotonically
    //    lowers quantization distortion but single-cell-probe recall is
    //    NOT monotone in it (measured: 6/30 → 7/30 at sf0.01, but
    //    11/30 → 8/30 at sf0.1, where re-assignment moves queries into
    //    cells that no longer hold their true neighbors — the standard
    //    cure is multi-probe, applied and judged as v13/v14).
    //    Round5OpsSpec pins the sf0.01 improvement; the sf0.1
    //    regression is the honest measurement a deployment gates on. ──
    ("v12_ann_recall_trained",
      (s: SparkSession, dir: String) =>
        recallOf(probeTopK(trainedAssigned(s, dir)), s, dir),
      s"""WITH $ivfAssignCtes,
         |$ivfTrainedCtes,
         |${ivfProbeCtes("assigned1", "iq1", "cand1", "ivf1")},
         |${recallTailSql("ivf1")}""".stripMargin),

    // ── v13: trained quantizer + two-cell multi-probe (the v07 probe
    //    over the v11 assignment) — the composition the v12 measurement
    //    calls for: re-assignment can move a query's true neighbors one
    //    cell over, and probing the two nearest trained cells is the
    //    standard recovery. Completes the ANN ablation grid: seed/
    //    trained × single/multi probe, every cell judged. ──
    ("v13_ann_ivf_trained_multiprobe",
      (s: SparkSession, dir: String) => trainedMultiProbe(s, dir)
        .orderBy(col("q_id"), col("rank")),
      s"""WITH $ivfAssignCtes,
         |$ivfTrainedCtes,
         |$ivfTrainedMultiProbeCtes
         |SELECT q_id, rank, vec_id, cos
         |FROM ivf2 ORDER BY q_id, rank""".stripMargin),

    // ── v14: recall@3 of the trained multi-probe — the fourth cell of
    //    the ablation grid's eval row (v10 seed-single, v12 trained-
    //    single, v14 trained-multi; v07's seed-multi is plan-equivalent
    //    modulo centroids). Round5OpsSpec pins that multi-probe
    //    recovers the single-probe regression at both judged SFs. ──
    ("v14_ann_recall_trained_multiprobe",
      (s: SparkSession, dir: String) =>
        recallOf(trainedMultiProbe(s, dir), s, dir),
      s"""WITH $ivfAssignCtes,
         |$ivfTrainedCtes,
         |$ivfTrainedMultiProbeCtes,
         |${recallTailSql("ivf2")}""".stripMargin),

    // ── v30: FILTERED vector search — the most-requested production
    //    vector-store capability: top-k among vectors satisfying a
    //    metadata predicate (label ∈ {2, 5}, a ~20% slice). The filter
    //    is applied INSIDE the inverted list before any distance math
    //    (pre-filtering; post-filtering an unfiltered top-3 silently
    //    returns fewer, or worse, admissible neighbors). The label is
    //    stored beside each vector in the persisted assignment, so the
    //    probe stays one broadcast hash join on the cell key and a
    //    selective predicate SHRINKS the candidate set — at 100 TB the
    //    filter composes with the index instead of fighting it. ──
    ("v30_filtered_search",
      (s: SparkSession, dir: String) => filteredTopK(s, dir)
        .orderBy(col("q_id"), col("rank")),
      s"""WITH $ivfAssignCtes,
         |$filteredProbeCtes
         |SELECT q_id, rank, vec_id, label, cos
         |FROM fivf ORDER BY q_id, rank""".stripMargin),

    // ── v31: recall@3 of the filtered probe vs the exact FILTERED
    //    ground truth — filtered-ANN judged against unfiltered truth
    //    would mark every correctly-filtered answer wrong, so the
    //    brute-force side applies the same predicate; k comes from the
    //    exact side so a cell that ran dry of admissible candidates
    //    scores an honest partial recall rather than vanishing. ──
    ("v31_filtered_recall",
      (s: SparkSession, dir: String) => filteredRecall(s, dir),
      s"""WITH $ivfAssignCtes,
         |$filteredProbeCtes,
         |$filteredRecallTailSql""".stripMargin),

    // ── IVF ANN, scale-parameterized multi-probe form: v05's 8 fixed
    //    centroids are a demo constant — the real config grows the cell
    //    count with the corpus (√n cells keeps both the assignment
    //    cross-score, n·√n, and the per-cell candidate list, ~√n,
    //    balanced) and probes more than one cell (nprobe=2: the
    //    query's top-2 cells by centroid cosine — recovers neighbors
    //    that fall just across a Voronoi boundary, the standard IVF
    //    recall fix). ncells derives from count(*) as a broadcast
    //    scalar inside the plan — both engines compute floor(sqrt(n))
    //    from the same relation, so the oracle stays exact at every SF
    //    without a hardcoded cell count. Each vector belongs to exactly
    //    one cell, so the two probed cells yield disjoint candidates —
    //    no dedup step. ──
    ("v07_ann_ivf_multiprobe",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
        val ncnt = emb.agg(count(lit(1)).as("n"))
        val cents = emb.crossJoin(broadcast(ncnt))
          .where(col("vec_id") < floor(sqrt(col("n").cast("double"))))
          .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
        val wAssign = Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("cent_id").asc)
        val ranked = emb.crossJoin(broadcast(cents))
          .withColumn("ccos", cosine(col("embedding"), col("cent")))
          .withColumn("rn", row_number().over(wAssign))
          .persist() // feeds cell assignment (rn=1) AND the probe set (rn<=2)
        val assigned = ranked.where(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"),
            normCol(col("embedding")).as("nrm"))
        val probes = ranked
          .where(col("vec_id") >= 10 && col("vec_id") < 20 && col("rn") <= 2)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("cent_id").as("cell"), normCol(col("embedding")).as("q_nrm"))
        val wRank = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)
        probes.join(assigned, Seq("cell"))
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")))
          .withColumn("rank", row_number().over(wRank))
          .where(col("rank") <= 3)
          .select(col("q_id"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("cos"))
          .orderBy(col("q_id"), col("rank"))
      },
      s"""WITH nc AS (SELECT count(*) AS n FROM embeddings),
         |cents AS (
         |  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings, nc
         |  WHERE vec_id < CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)),
         |scored AS (
         |  SELECT e.vec_id, e.embedding, c.cent_id,
         |         ${cosineSql("e.embedding", "c.cent")} AS ccos
         |  FROM embeddings e, cents c),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY vec_id
         |            ORDER BY ccos DESC, cent_id ASC) AS rn
         |  FROM scored),
         |assigned AS (
         |  SELECT vec_id, embedding, cent_id AS cell, ${normSql("embedding")} AS nrm
         |  FROM ranked WHERE rn = 1),
         |q AS (
         |  SELECT vec_id AS q_id, embedding AS q_emb, cent_id AS cell,
         |         ${normSql("embedding")} AS q_nrm
         |  FROM ranked WHERE vec_id >= 10 AND vec_id < 20 AND rn <= 2),
         |cand AS (
         |  SELECT q.q_id, e.vec_id,
         |         ${cosPreSql(dotFoldSql("q.q_emb", "e.embedding", 64), "q.q_nrm", "e.nrm")} AS cos
         |  FROM q JOIN assigned e ON q.cell = e.cell AND e.vec_id <> q.q_id),
         |rankd AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |            ORDER BY cos DESC, vec_id ASC) AS rank
         |  FROM cand)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos
         |FROM rankd WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin),

    // ── LSH ANN, scale-parameterized form: v02's NPlanes=4 is a demo
    //    constant — the plane count must GROW with the corpus to keep
    //    buckets bounded (target ~64 vectors/bucket → planes =
    //    ceil(log2(n/64)), clamped [4, 20]). Like v07, the parameter
    //    derives from count(*) inside the plan, so both engines compute
    //    the same plane count at every SF with nothing hardcoded. The
    //    bucket key is the sign STRING over a dynamic-length plane
    //    sequence (array_join over transform — no dynamic bit-shift
    //    needed, and the key space still doubles per plane). The
    //    signature loop calls the native plane_dot kernel per element;
    //    same IEEE ops as v02's unrolled form. ──
    ("v08_ann_lsh_scaled",
      (s: SparkSession, dir: String) => {
        val emb0 = Tables(s, dir, "embeddings")
        val ncnt = emb0.agg(count(lit(1)).as("n"))
        val npl = greatest(lit(4L), least(lit(20L),
          ceil(log2(col("n").cast("double") / lit(64.0))))).cast("int")
        val emb = emb0.crossJoin(broadcast(ncnt))
          .select(col("vec_id"), col("embedding"),
            array_join(transform(sequence(lit(0), npl - 1),
              j => when(call_function("plane_dot", col("embedding"), j) >= 0,
                lit("1")).otherwise(lit("0"))), "").as("bucket"),
            normCol(col("embedding")).as("nrm"))
        val queries = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("bucket"), col("nrm").as("q_nrm"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)
        broadcast(queries)
          .join(emb, Seq("bucket"))
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= 3)
          .select(col("q_id"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("cos"))
          .orderBy(col("q_id"), col("rank"))
      },
      {
        val planeDotJ =
          s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(generate_series(1, $Dim), i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE) * CAST((j * 37 + i * 101) % 97 - 48 AS DOUBLE))), (acc, x) -> acc + x)"
        s"""WITH nc AS (SELECT count(*) AS n FROM embeddings),
           |np AS (
           |  SELECT CAST(greatest(4, least(20, ceil(log2(CAST(n AS DOUBLE) / 64.0)))) AS INT) AS p
           |  FROM nc),
           |b AS (
           |  SELECT vec_id, embedding,
           |         array_to_string(list_transform(generate_series(0, p - 1),
           |           j -> CASE WHEN $planeDotJ >= 0 THEN '1' ELSE '0' END), '') AS bucket,
           |         ${normSql("embedding")} AS nrm
           |  FROM embeddings, np),
           |q AS (
           |  SELECT vec_id AS q_id, embedding AS q_emb, bucket, nrm AS q_nrm
           |  FROM b WHERE vec_id < 10),
           |scored AS (
           |  SELECT q.q_id, e.vec_id,
           |         ${cosPreSql(dotFoldSql("q.q_emb", "e.embedding", 64), "q.q_nrm", "e.nrm")} AS cos
           |  FROM q JOIN b e ON q.bucket = e.bucket AND e.vec_id <> q.q_id),
           |ranked AS (
           |  SELECT *, row_number() OVER (PARTITION BY q_id
           |            ORDER BY cos DESC, vec_id ASC) AS rank
           |  FROM scored)
           |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos
           |FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin
      }),

    // ── per-label centroids: exact elementwise mean via scaled longs ──
    ("v03_label_centroid",
      (s: SparkSession, dir: String) => {
        Tables(s, dir, "embeddings")
          .select(col("label").cast("long").as("label"),
            posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("label"), (col("pos") + 1).cast("long").as("pos"))
          // cast BEFORE scaling so Spark multiplies in double exactly like
          // the oracle's CAST(... AS DOUBLE) * 1000000 — agreement must not
          // hinge on float*int staying in range of float precision
          .agg(sum(round(col("v").cast("double") * 1000000).cast("long")).as("sv"),
            count(lit(1)).as("n"))
          .select(col("label"), col("pos"),
            ((col("sv").cast("double") / 1000000.0) / col("n").cast("double")).as("mean_v"))
          .orderBy(col("label"), col("pos"))
      },
      s"""SELECT CAST(label AS BIGINT) AS label, CAST(i AS BIGINT) AS pos,
         |  (CAST(sum(CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000.0)
         |    / CAST(count(*) AS DOUBLE) AS mean_v
         |FROM embeddings, (SELECT unnest(generate_series(1, $Dim)) AS i)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // ── parity proof for the native vector kernels (the g11 pattern):
    //    `dot_fold` / `plane_dot` (codegen'd JVM loops, GraftExtensions)
    //    against the interpreted composed HOF forms they replace, both
    //    judged by ONE DuckDB oracle. A hash-green run pins that the
    //    native loops do the same IEEE double ops in the same index order
    //    as `Portable.dotFold` / `planeDotHof` — the license to use the
    //    native forms in every v-family hot loop. ──
    ("v06_native_dot_parity",
      (s: SparkSession, dir: String) => {
        Tables(s, dir, "embeddings")
          .where(col("vec_id") < 200)
          .select(col("vec_id"),
            round(dotNative(col("embedding"), col("embedding")), 6).as("dot_native"),
            round(Portable.dotFold(col("embedding"), col("embedding")), 6).as("dot_hof"),
            round(planeDot(col("embedding"), 1), 6).as("pd1_native"),
            round(planeDotHof(col("embedding"), 1), 6).as("pd1_hof"),
            round(planeDot(col("embedding"), 3), 6).as("pd3_native"),
            round(planeDotHof(col("embedding"), 3), 6).as("pd3_hof"))
          .orderBy(col("vec_id"))
      },
      s"""SELECT vec_id,
         |  round(${dotFoldSql("embedding", "embedding", Dim)}, 6) AS dot_native,
         |  round(${dotFoldSql("embedding", "embedding", Dim)}, 6) AS dot_hof,
         |  round(${planeDotSql("embedding", 1)}, 6) AS pd1_native,
         |  round(${planeDotSql("embedding", 1)}, 6) AS pd1_hof,
         |  round(${planeDotSql("embedding", 3)}, 6) AS pd3_native,
         |  round(${planeDotSql("embedding", 3)}, 6) AS pd3_hof
         |FROM embeddings WHERE vec_id < 200 ORDER BY vec_id""".stripMargin),

    // ── int8-style scalar quantization + quantized cosine top-k: the
    //    memory/bandwidth scale path for ANN — each float32 dim becomes a
    //    small integer in [-127, 127] (4× smaller stored as bytes), and
    //    the score loop runs over the quantized vectors. Quantized values
    //    are integers exactly representable in float, so the native
    //    codegen'd `dot_fold` kernel computes them EXACTLY (every product
    //    and partial sum is an integer < 2^24 — no FP rounding anywhere
    //    in the dot), which is what lets DuckDB judge the full top-k
    //    including the scores. The global max-|x| scale factor is one
    //    relational pass (posexplode → max) broadcast back — at 100 TB
    //    quantization is a one-time materialized rewrite of the corpus,
    //    amortized over every query that follows. ──
    ("v09_quantized_topk",
      (s: SparkSession, dir: String) => {
        val m = Tables(s, dir, "embeddings")
          .select(posexplode(col("embedding")).as(Seq("i", "v")))
          .agg(max(abs(col("v").cast("double"))).as("m"))
        val quant = Tables(s, dir, "embeddings")
          .crossJoin(broadcast(m))
          .select(col("vec_id"),
            transform(col("embedding"),
              x => round(x.cast("double") / col("m") * 127, 0).cast("float"))
              .as("qv"))
          .withColumn("qn", sqrt(dotNative(col("qv"), col("qv"))))
        val queries = quant.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("qv").as("q_qv"),
            col("qn").as("q_qn"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos_q").desc, col("vec_id").asc)
        broadcast(queries).crossJoin(quant)
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("cos_q", cosPre(dotNative(col("q_qv"), col("qv")),
            col("q_qn"), col("qn")))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= 5)
          .select(col("q_id"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("cos_q"))
          .orderBy(col("q_id"), col("rank"))
      },
      s"""WITH mm AS (
         |  SELECT max(abs(CAST(v AS DOUBLE))) AS m
         |  FROM (SELECT unnest(embedding) AS v FROM embeddings)),
         |q0 AS (
         |  SELECT vec_id, list_transform(embedding,
         |           x -> CAST(round(CAST(x AS DOUBLE) / mm.m * 127, 0) AS FLOAT)) AS qv
         |  FROM embeddings, mm),
         |e AS (SELECT vec_id, qv, sqrt(${dotFoldSql("qv", "qv", Dim)}) AS qn FROM q0),
         |q AS (SELECT vec_id AS q_id, qv AS q_qv, qn AS q_qn FROM e WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, e.vec_id,
         |         ${cosPreSql(dotFoldSql("q.q_qv", "e.qv", 64), "q.q_qn", "e.qn")} AS cos_q
         |  FROM q, e WHERE e.vec_id <> q.q_id),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |            ORDER BY cos_q DESC, vec_id ASC) AS rank
         |  FROM scored)
         |SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos_q
         |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin),

    // ── v15: SEMANTIC dedup (the SemDeDup recipe): cluster the corpus
    //    with a data-trained coarse quantizer, then search for
    //    near-duplicate pairs ONLY within a cluster — the scale shape
    //    that keeps embedding dedup tractable when even an LSH-bucketed
    //    global search (v04) is too wide: cluster count grows with the
    //    corpus (v07's √n rule composes here), per-cluster candidate
    //    sets stay bounded by [[BucketCap]]. Quantizer: 32 seed
    //    centroids + one exact Lloyd iteration (the judged v11 recipe —
    //    scaled-long means, identical BIGINTs on both engines), so
    //    clusters are data-driven, not random hyperplanes. Eviction is
    //    deterministic min-id: a vector is removed iff a smaller-id
    //    cluster-mate scores cos ≥ 0.9, reporting the smallest such
    //    keeper. The ×2-scaled twins (exact exponent shift — same cell
    //    by cosine scale-invariance, cos 1.0 with the original) pin
    //    non-vacuity at every SF. ──
    ("v15_semantic_dedup",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        val seeded = emb.unionByName(
          emb.where(col("vec_id") < 10)
            .select((col("vec_id") + 1000000000000L).as("vec_id"),
              transform(col("embedding"), x => x * lit(2.0f)).as("embedding")))
        val cents0 = emb.where(col("vec_id") < 32)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
        val wAssign = Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("cent_id").asc)
        val a0 = emb.crossJoin(broadcast(cents0))
          .withColumn("ccos", cosine(col("embedding"), col("cent")))
          .withColumn("rn", row_number().over(wAssign))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
        val cents1 = a0
          .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("cell"), col("pos"))
          .agg(sum(round(col("v").cast("double") * 1000000).cast("long")).as("sv"),
            count(lit(1)).as("n"))
          .select(col("cell"), col("pos"),
            ((col("sv").cast("double") / 1000000.0) / col("n").cast("double")).as("mv"))
          .groupBy(col("cell"))
          .agg(array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"))
          .select(col("cell").as("cent_id"),
            transform(col("pm"), x => x.getField("mv")).as("cent"))
          .withColumn("cnrm", sqrt(Portable.dotFold(col("cent"), col("cent"))))
        val wCell = Window.partitionBy(col("cell"))
        val assigned = seeded
          .withColumn("nrm", normCol(col("embedding")))
          .crossJoin(broadcast(cents1))
          // trained centroids are exact doubles — composed fold, not the
          // float-array native kernel (the v11 narrowing rule)
          .withColumn("ccos",
            round(Portable.dotFold(col("embedding"), col("cent")) / (col("nrm") * col("cnrm")), 6))
          .withColumn("rn", row_number().over(wAssign))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"), col("nrm"))
          // hot-cell guard rides the cell shuffle the self-join needs anyway
          .withColumn("nc", count(lit(1)).over(wCell))
          .where(col("nc") <= BucketCap).drop("nc")
          .persist() // self-joined: assignment + norm computed once
        assigned.as("a").join(assigned.as("b"),
            col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
          .withColumn("cos", cosPre(dotNative(col("a.embedding"), col("b.embedding")),
            col("a.nrm"), col("b.nrm")))
          .where(col("cos") >= 0.9)
          .select(col("b.vec_id").as("vec_id"), col("b.cell").as("cell"),
            col("a.vec_id").as("va"), col("cos"))
          .groupBy(col("vec_id"), col("cell"))
          .agg(min(col("va")).as("keeper_id"), max(col("cos")).as("best_cos"))
          .orderBy(col("vec_id"))
      },
      s"""WITH seededv AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000000000, list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
         |  FROM embeddings WHERE vec_id < 10),
         |cents0 AS (
         |  SELECT vec_id AS cent_id, embedding AS cent FROM embeddings WHERE vec_id < 32),
         |sc0 AS (
         |  SELECT e.vec_id, e.embedding, c.cent_id, ${cosineSql("e.embedding", "c.cent")} AS ccos
         |  FROM embeddings e, cents0 c),
         |a0 AS (
         |  SELECT vec_id, embedding, cent_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rn
         |    FROM sc0) WHERE rn = 1),
         |cmean AS (
         |  SELECT cell, i AS pos,
         |    (CAST(sum(CAST(round(CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000.0)
         |      / CAST(count(*) AS DOUBLE) AS mv
         |  FROM a0, (SELECT unnest(generate_series(1, $Dim)) AS i) GROUP BY 1, 2),
         |cent1 AS (SELECT cell AS cent_id, list(mv ORDER BY pos) AS cent FROM cmean GROUP BY 1),
         |cent1n AS (SELECT cent_id, cent, sqrt(${dotFoldSql("cent", "cent", Dim)}) AS cnrm FROM cent1),
         |sv AS (SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM seededv),
         |sc1 AS (
         |  SELECT v.vec_id, v.embedding, v.nrm, c.cent_id,
         |         round(${dotFoldSql("v.embedding", "c.cent", Dim)} / (v.nrm * c.cnrm), 6) AS ccos
         |  FROM sv v, cent1n c),
         |a1 AS (
         |  SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id ASC) AS rn
         |    FROM sc1) WHERE rn = 1),
         |capped AS (
         |  SELECT * FROM a1 QUALIFY count(*) OVER (PARTITION BY cell) <= $BucketCap),
         |pairs AS (
         |  SELECT a.cell, a.vec_id AS va, b.vec_id AS vb,
         |         ${cosPreSql(dotFoldSql("a.embedding", "b.embedding", 64), "a.nrm", "b.nrm")} AS cos
         |  FROM capped a JOIN capped b ON a.cell = b.cell AND a.vec_id < b.vec_id)
         |SELECT vb AS vec_id, cell, CAST(min(va) AS BIGINT) AS keeper_id, max(cos) AS best_cos
         |FROM pairs WHERE cos >= 0.9 GROUP BY 1, 2 ORDER BY 1""".stripMargin),

    // ── v16: PRODUCT-QUANTIZATION ADC search — the memory-side half of
    //    a production ANN stack (IVF prunes candidates, PQ shrinks each
    //    candidate to NSub code bytes so the scan is table lookups, not
    //    float folds). 64 dims → 8 subspaces × 8 dims; per-subspace
    //    codebook = the 8 seed vectors' subvectors (the v05 seed-set
    //    discipline; v17 trains it with one Lloyd step per subspace and
    //    judges the trained pipeline's recall end-to-end). Encode:
    //    nearest code per (vector, subspace) via ONE hash agg —
    //    `min(struct(d2, code_id))` gives the deterministic tie-break
    //    with map-side combine, no window over the 64×n scored rows.
    //    Query: the asymmetric-distance lookup table (10 queries × 64
    //    codes) broadcasts, the corpus's code rows join it, and ADC =
    //    one integer sum — micro-unit BIGINTs, since the d2 folds are
    //    bit-identical IEEE on both engines (no trig), so the judged
    //    compare is exact. Scale: codebook + ADC table are O(queries ×
    //    codes) broadcasts; the per-(q, vec) sum has map-side combine;
    //    the corpus never moves uncompressed. ──
    ("v16_pq_adc",
      (s: SparkSession, dir: String) =>
        pqTopK(s, dir).orderBy(col("q_id"), col("rank")),
      s"""WITH $pqOracleCtes
         |SELECT q_id, rank, vec_id, adc_us FROM pq
         |ORDER BY q_id, rank""".stripMargin),

    // ── v17: TRAINED PQ codebooks + end-to-end recall — the follow-up
    //    v16 documented. One Lloyd step per subspace (assign to the seed
    //    codebook, recompute each code as the exact mean of its assigned
    //    subvectors, re-encode against the trained codebook — the v11
    //    machinery composed per subspace), then the judged output is the
    //    v10-style evaluation row: trained-ADC top-5 per query vs the
    //    EXACT full-vector squared-L2 top-5 (micro-unit BIGINTs — the
    //    d2 folds are bit-identical IEEE on both engines), recall@5 per
    //    query. The whole pipeline — encode, train, re-encode, ADC
    //    lookup-sum, rank, exact baseline, recall join — is inside the
    //    one hash-judged query. Scale: codebooks and ADC tables stay
    //    O(subspaces × codes) broadcasts however large the corpus; the
    //    training step is one hash agg over (j, code, pos) — 512 groups;
    //    the exact baseline broadcasts 10 queries (the v01 shape). ──
    ("v17_pq_trained_recall",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
        val subs = pqSubs(s, dir)
        val codes0 = emb.where(col("vec_id") < 8)
          .select(col("vec_id").as("code_id"), subSlices(col("embedding")).as("e"))
          .select(col("e.j").as("j"), col("code_id"), col("e.sub").as("csub"))
        val cb1 = pqTrainCodebook(pqAssign(subs, codes0)).persist()
        val asg1 = pqAssign(subs, cb1)
          .select(col("vec_id"), col("j"), col("code_id"))
        val qtab1 = subs.where(col("vec_id") >= 10 && col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("j"), col("sub").as("qsub"))
          .join(broadcast(cb1), Seq("j"))
          .select(col("q_id"), col("j"), col("code_id"),
            round(subD2(col("qsub"), col("csub")) * 1000000).cast("long").as("ql"))
        val wRank = Window.partitionBy(col("q_id"))
          .orderBy(col("adc_us"), col("vec_id"))
        val approx = asg1.join(broadcast(qtab1), Seq("j", "code_id"))
          .where(col("vec_id") =!= col("q_id"))
          .groupBy(col("q_id"), col("vec_id"))
          .agg(sum(col("ql")).as("adc_us"))
          .withColumn("rank", row_number().over(wRank))
          .where(col("rank") <= 5)
          .select(col("q_id"), col("vec_id"))
        val qs = emb.where(col("vec_id") >= 10 && col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val wq = Window.partitionBy(col("q_id"))
          .orderBy(col("d2_us"), col("vec_id"))
        val exact = broadcast(qs).crossJoin(emb)
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("d2_us",
            round(subD2(col("q_emb"), col("embedding")) * 1000000).cast("long"))
          .withColumn("rank", row_number().over(wq))
          .where(col("rank") <= 5)
          .select(col("q_id"), col("vec_id"))
        val hits = approx.join(exact, Seq("q_id", "vec_id"), "left_semi")
          .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
        exact.groupBy(col("q_id")).agg(count(lit(1)).as("k"))
          .join(hits, Seq("q_id"), "left")
          .select(col("q_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("k"),
            round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("k").cast("double"), 4)
              .as("recall"))
          .orderBy(col("q_id"))
      },
      s"""WITH $pqOracleCtes,
         |ps AS (SELECT unnest(generate_series(1, $SubDim)) AS pos),
         |tr AS (
         |  SELECT a.j, a.code_id, ps.pos,
         |         CAST(sum(CAST(round(CAST(e.embedding[CAST(a.j * $SubDim + ps.pos AS INT)] AS DOUBLE) * 1000000, 0) AS BIGINT)) AS BIGINT) AS sv,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM asg a JOIN embeddings e ON e.vec_id = a.vec_id, ps
         |  GROUP BY 1, 2, 3),
         |cb1 AS (
         |  SELECT j, code_id,
         |         list((CAST(sv AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE)
         |              ORDER BY pos) AS csub
         |  FROM tr GROUP BY 1, 2),
         |scored1 AS (
         |  SELECT e.vec_id, c.j, c.code_id,
         |         ${trainedD2Sql("e.embedding", s"c.j * $SubDim", "c.csub")} AS d2
         |  FROM embeddings e, cb1 c),
         |asg1 AS (
         |  SELECT vec_id, j, code_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id, j
         |              ORDER BY d2, code_id) AS rn
         |    FROM scored1) WHERE rn = 1),
         |qtab1 AS (
         |  SELECT vec_id AS q_id, j, code_id,
         |         CAST(round(d2 * 1000000, 0) AS BIGINT) AS ql
         |  FROM scored1 WHERE vec_id >= 10 AND vec_id < 20),
         |approx AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |              ORDER BY adc_us, vec_id) AS rank
         |    FROM (SELECT q.q_id, a.vec_id, CAST(sum(q.ql) AS BIGINT) AS adc_us
         |          FROM asg1 a JOIN qtab1 q ON q.j = a.j AND q.code_id = a.code_id
         |          WHERE a.vec_id <> q.q_id GROUP BY 1, 2))
         |  WHERE rank <= 5),
         |exact AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q.vec_id AS q_id, e.vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |             CAST(round(${pqD2Sql("q.embedding", "e.embedding", "0", Dim)} * 1000000, 0) AS BIGINT),
         |             e.vec_id) AS rank
         |    FROM embeddings q, embeddings e
         |    WHERE q.vec_id >= 10 AND q.vec_id < 20 AND e.vec_id <> q.vec_id)
         |  WHERE rank <= 5),
         |hits AS (
         |  SELECT a.q_id, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM approx a WHERE EXISTS (
         |    SELECT 1 FROM exact x WHERE x.q_id = a.q_id AND x.vec_id = a.vec_id)
         |  GROUP BY 1)
         |SELECT k.q_id, coalesce(h.n_hit, 0) AS n_hit, k.k,
         |       round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(k.k AS DOUBLE), 4) AS recall
         |FROM (SELECT q_id, CAST(count(*) AS BIGINT) AS k FROM exact GROUP BY 1) k
         |LEFT JOIN hits h ON h.q_id = k.q_id
         |ORDER BY k.q_id""".stripMargin),

    // ── v18: CLUSTER-BALANCED SAMPLING — topic debiasing over embedding
    //    space: cap dominant semantic clusters so the subsample's topic
    //    mix flattens (the curation step AFTER clustering; pairs with
    //    v15's SemDeDup, which removes near-duplicates WITHIN a cell
    //    while this rebalances ACROSS cells). Mechanics are the q08
    //    exact-quota temperature machinery (α = 0.5: integer weights
    //    floor(√n_cell), quotas B·w DIV Σw, smallest-hash-residue
    //    selection behind a ~4×-quota prefilter) applied to the v05
    //    seed cell assignment instead of a metadata column — the
    //    stratum is LEARNED from the vectors, not read from a field.
    //    One broadcast quantizer pass + one broadcast quota join; the
    //    rank window input is quota-bounded at any corpus size. ──
    ("v18_cluster_balanced_sample",
      (s: SparkSession, dir: String) => {
        val asg = seedAssigned(s, dir).select(col("vec_id"), col("cell"))
        val counts = asg.groupBy(col("cell")).agg(count(lit(1)).as("n_cell"))
        val w = counts.select(col("cell"), col("n_cell"),
          floor(sqrt(col("n_cell").cast("double"))).cast("long").as("w"))
        val quota = w.crossJoin(broadcast(w.agg(sum(col("w")).as("tw"))))
          .select(col("cell"), col("n_cell"),
            least(col("n_cell"), expr("(100 * w) DIV tw")).as("quota"))
          .withColumn("thr",
            least(lit(1000000L), expr("(4 * quota * 1000000) DIV n_cell + 1")))
          .select(col("cell"), col("quota"), col("thr"))
        asg
          .withColumn("h6", pmod(
            portableHash(concat(lit("v18|"), col("vec_id").cast("string"))),
            lit(1000000L)))
          .join(broadcast(quota), Seq("cell"))
          .where(col("h6") < col("thr"))
          .withColumn("rk", row_number().over(
            Window.partitionBy(col("cell")).orderBy(col("h6"), col("vec_id"))))
          .where(col("rk") <= col("quota"))
          .select(col("vec_id"), col("cell").cast("long").as("cell"))
          .orderBy(col("vec_id"))
      },
      s"""WITH $ivfAssignCtes,
         |counts AS (
         |  SELECT cell, CAST(count(*) AS BIGINT) AS n_cell FROM assigned GROUP BY 1),
         |w AS (
         |  SELECT cell, n_cell,
         |         CAST(floor(sqrt(CAST(n_cell AS DOUBLE))) AS BIGINT) AS w
         |  FROM counts),
         |quota AS (
         |  SELECT cell, n_cell,
         |         least(n_cell, (100 * w) // (SELECT sum(w) FROM w)) AS quota
         |  FROM w),
         |q2 AS (
         |  SELECT cell, quota,
         |         least(1000000, (4 * quota * 1000000) // n_cell + 1) AS thr
         |  FROM quota),
         |vcand AS (
         |  SELECT a.vec_id, a.cell, q2.quota, q2.thr,
         |         ${portableHashSql("'v18|' || CAST(a.vec_id AS VARCHAR)")} % 1000000 AS h6
         |  FROM assigned a JOIN q2 USING (cell)),
         |vranked AS (
         |  SELECT vec_id, cell, quota,
         |         row_number() OVER (PARTITION BY cell ORDER BY h6, vec_id) AS rk
         |  FROM vcand WHERE h6 < thr)
         |SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM vranked WHERE rk <= quota
         |ORDER BY vec_id""".stripMargin),

    // ── v19: IVF + PQ (IVFADC) — the two halves of the production ANN
    //    stack COMPOSED, the FAISS IVFADC shape: the v05 coarse
    //    quantizer prunes the candidate set to the query's cell
    //    (~n/cells rows instead of n), then the v16 asymmetric-distance
    //    lookup scores only those survivors from their NSub-byte PQ
    //    codes. This is the index a 100 TB embedding corpus actually
    //    serves from: the coarse assignment is a broadcast pass, the
    //    codebook and per-query ADC tables stay O(queries × codes)
    //    broadcasts, and ranking touches compressed codes of ONE cell
    //    per query — the cell key turns what v16 ran as a full
    //    compressed scan into a hash-join partition probe, so query
    //    cost scales with cell size, not corpus size. Candidate ADC
    //    sums keep map-side combine; the corpus never moves
    //    uncompressed. Judged end-to-end: (q_id, rank, vec_id, adc_us)
    //    top-5 within the probed cell, micro-unit BIGINTs (the d2
    //    folds are bit-identical IEEE on both engines) so the compare
    //    is exact. ──
    ("v19_ann_ivfpq",
      (s: SparkSession, dir: String) =>
        ivfPqTopK(s, dir).orderBy(col("q_id"), col("rank")),
      s"""WITH $ivfPqOracleCtes
         |SELECT q_id, rank, vec_id, adc_us FROM ivfpq
         |ORDER BY q_id, rank""".stripMargin),

    // ── v20: the IVFADC index's in-pipeline quality evaluation — the
    //    v10/v12/v14/v17 discipline applied to v19, completing the
    //    eval symmetry (every ANN variant in the catalog ships with its
    //    judged recall row): per-query recall@5 of the cell-pruned ADC
    //    top-5 against the EXACT full-vector squared-L2 top-5
    //    (micro-unit BIGINTs, bit-exact on both engines). This is the
    //    number an index tuner actually watches when trading nprobe and
    //    code size against recall — and it is itself one relational
    //    query, so the 100 TB evaluation runs where the index lives
    //    instead of exporting candidates to a driver script. ──
    ("v20_ann_recall_ivfpq",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
        val approx = ivfPqTopK(s, dir).select(col("q_id"), col("vec_id"))
        val qs = emb.where(col("vec_id") >= 10 && col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
        val wq = Window.partitionBy(col("q_id"))
          .orderBy(col("d2_us"), col("vec_id"))
        val exact = broadcast(qs).crossJoin(emb)
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("d2_us",
            round(subD2(col("q_emb"), col("embedding")) * 1000000).cast("long"))
          .withColumn("rank", row_number().over(wq))
          .where(col("rank") <= 5)
          .select(col("q_id"), col("vec_id"))
        val hits = approx.join(exact, Seq("q_id", "vec_id"), "left_semi")
          .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
        exact.groupBy(col("q_id")).agg(count(lit(1)).as("k"))
          .join(hits, Seq("q_id"), "left")
          .select(col("q_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("k"),
            round(coalesce(col("n_hit"), lit(0L)).cast("double") / col("k").cast("double"), 4)
              .as("recall"))
          .orderBy(col("q_id"))
      },
      s"""WITH $ivfPqOracleCtes,
         |exact AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q.vec_id AS q_id, e.vec_id,
         |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |             CAST(round(${pqD2Sql("q.embedding", "e.embedding", "0", Dim)} * 1000000, 0) AS BIGINT),
         |             e.vec_id) AS rank
         |    FROM embeddings q, embeddings e
         |    WHERE q.vec_id >= 10 AND q.vec_id < 20 AND e.vec_id <> q.vec_id)
         |  WHERE rank <= 5),
         |hits AS (
         |  SELECT a.q_id, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM ivfpq a WHERE EXISTS (
         |    SELECT 1 FROM exact x WHERE x.q_id = a.q_id AND x.vec_id = a.vec_id)
         |  GROUP BY 1)
         |SELECT k.q_id, coalesce(h.n_hit, 0) AS n_hit, k.k,
         |       round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(k.k AS DOUBLE), 4) AS recall
         |FROM (SELECT q_id, CAST(count(*) AS BIGINT) AS k FROM exact GROUP BY 1) k
         |LEFT JOIN hits h ON h.q_id = k.q_id
         |ORDER BY k.q_id""".stripMargin),

    // ── v21: Matryoshka (MRL) two-stage funnel — stage 1 scores every
    //    candidate on the FIRST MrlDim dims only (MRL-trained embeddings
    //    nest: any prefix is itself a valid lower-dim embedding of the
    //    same object), keeps a Shortlist-wide candidate set per query,
    //    stage 2 rescores just that shortlist at full Dim precision.
    //    The production coarse-to-fine rerank shape: stage-1 fold cost
    //    per candidate drops Dim/MrlDim = 4×, and stage-2 cost is
    //    shortlist-bounded (16 rows per query) at ANY corpus size. The
    //    stage-1 sweep composes with any candidate generator in the
    //    catalog (v05/v11 cells, v19 ADC) — judged here over the full
    //    corpus so the funnel itself, not the generator, is what the
    //    oracle checks. ──
    ("v21_mrl_funnel",
      (s: SparkSession, dir: String) =>
        mrlFunnel(s, dir).orderBy(col("q_id"), col("rank")),
      s"""WITH $mrlOracleCtes
         |SELECT q_id, rank, vec_id, cos FROM mrl
         |ORDER BY q_id, rank""".stripMargin),

    // ── v22: the funnel's judged recall@3 vs the exact full-dim top-3
    //    (the v10/v12/v14/v17/v20 discipline — every retrieval variant
    //    ships with its in-pipeline quality row). This is the number
    //    that prices the Matryoshka trade: how much of the exact
    //    neighborhood survives scoring 4×-cheaper prefixes first. ──
    ("v22_ann_recall_mrl",
      (s: SparkSession, dir: String) => recallOf(mrlFunnel(s, dir), s, dir),
      s"""WITH $mrlOracleCtes,
         |${recallTailSql("mrl")}""".stripMargin),

    // ── v23: hard-negative mining — the contrastive-training data-prep
    //    step (DPR/Contriever recipe): for each anchor, the top-3 most
    //    cosine-similar vectors with a DIFFERENT label. Same sweep
    //    shape as v01 (broadcast anchors × corpus, one pass), with the
    //    label inequality pushed into the join condition so same-class
    //    candidates never reach the rank window; at scale the sweep
    //    swaps for any catalog candidate generator and the label filter
    //    rides along unchanged. ──
    ("v23_hard_negatives",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings")
          .select(col("vec_id"), col("label").cast("long").as("label"),
            col("embedding"), normCol(col("embedding")).as("nrm"))
        val anchors = emb.where(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("label").as("q_label"),
            col("embedding").as("q_emb"), col("nrm").as("q_nrm"))
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)
        broadcast(anchors).crossJoin(emb)
          .where(col("vec_id") =!= col("q_id") && col("label") =!= col("q_label"))
          .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")))
          .withColumn("rank", row_number().over(w))
          .where(col("rank") <= 3)
          .select(col("q_id"), col("q_label"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("label").as("neg_label"), col("cos"))
          .orderBy(col("q_id"), col("rank"))
      },
      s"""WITH e AS (
         |  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding,
         |         ${normSql("embedding")} AS nrm FROM embeddings),
         |q AS (
         |  SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb,
         |         nrm AS q_nrm FROM e WHERE vec_id < 10),
         |scored AS (
         |  SELECT q.q_id, q.q_label, e.vec_id, e.label AS neg_label,
         |         ${cosPreSql(dotFoldSql("q.q_emb", "e.embedding", 64), "q.q_nrm", "e.nrm")} AS cos
         |  FROM q, e WHERE e.vec_id <> q.q_id AND e.label <> q.q_label),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |            ORDER BY cos DESC, vec_id ASC) AS rank
         |  FROM scored)
         |SELECT q_id, q_label, CAST(rank AS BIGINT) AS rank, vec_id,
         |       neg_label, cos
         |FROM ranked WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin),

    // ── v24: top principal direction by matrix-free power iteration —
    //    distributed linear algebra with no driver-side matrix and no
    //    collect: each round is ONE corpus pass computing u = Σ_rows
    //    (e·v)·e as 64 exact scaled-long sums (round(·×1e6) BIGINTs —
    //    order-independent, so a 1000-executor shuffle reduces them
    //    bit-identically), then a 64-row normalize; the new direction
    //    re-enters the plan as a broadcast array and the 64-row state
    //    frame is localCheckpoint'd per round (the t10/g19/t23b
    //    iterative-chain discipline — per-round cost is independent of
    //    how many rounds preceded it). Three unrolled rounds judge
    //    against the oracle's identical CTE chain — the fixed-point
    //    rounding at each hand-off keeps the chained doubles
    //    bit-identical across engines, where float PCA never could.
    //    Output: the direction plus the Rayleigh-style eigenvalue
    //    estimate |u|₂ of the final round. The per-row e·v uses the
    //    interpreted double fold (v is array<double>; the codegen'd
    //    dot_fold kernel is float-typed) — the reduction explode
    //    dominates the pass, and quantizing v to float to reach the
    //    native kernel would break oracle parity. ──
    ("v24_pca_power",
      (s: SparkSession, dir: String) => powerIteration(s, dir),
      s"""WITH v0 AS (
         |  SELECT unnest(generate_series(1, $Dim)) AS pos, 0.125 AS val),
         |${powerIterCtes(1, "v0")},
         |${powerIterCtes(2, "v1")},
         |${powerIterCtes(3, "v2")}
         |SELECT CAST(pos AS BIGINT) AS pos, val AS loading,
         |       round(n3.nrm, 6) AS lambda
         |FROM v3, n3 ORDER BY pos""".stripMargin),

    // ── v25: binary sign-code Hamming retrieval — the third compression
    //    family member beside int8 (v09) and PQ (v16): binarize each
    //    dim to its sign bit, store the corpus as two BIGINT halves
    //    (16 bytes/vector — 256× smaller than float64), rank by
    //    popcount(xor). Both the encode and the probe are pure integer
    //    codegen — no floats anywhere after the sign test — so the
    //    judged output is exact by construction, and at 100 TB the
    //    scan that serves the probe reads 16-byte codes, not
    //    embeddings. ──
    ("v25_binary_hamming",
      (s: SparkSession, dir: String) =>
        binaryTopK(s, dir).orderBy(col("q_id"), col("rank")),
      s"""WITH $binaryOracleCtes
         |SELECT q_id, rank, vec_id, hamming FROM bin
         |ORDER BY q_id, rank""".stripMargin),

    // ── v26: the binary index's judged recall row (the discipline:
    //    every retrieval variant ships its in-pipeline quality
    //    evaluation) — recall@3 of the 1-bit-per-dim code against the
    //    exact full-precision cosine top-3 prices the 256× compression
    //    in the only currency that matters. ──
    ("v26_ann_recall_binary",
      (s: SparkSession, dir: String) => recallOf(binaryTopK(s, dir), s, dir),
      s"""WITH $binaryOracleCtes,
         |${recallTailSql("bin")}""".stripMargin),

    // ── v27: the nprobe/recall TUNING CURVE as one relational query —
    //    the g28b sweep-as-rows discipline applied to index tuning:
    //    every nprobe ∈ {1,2,3} of the trained IVF evaluated in a
    //    single plan. A probe row with cell-rank r serves every
    //    nprobe ≥ r, so the probe set EXPLODES to its (nprobe, cell)
    //    memberships (≤ 3× ten query rows — broadcast-sized at any
    //    corpus size) and one cell equi-join + one (nprobe, q_id) rank
    //    window scores all three operating points; adding candidates
    //    adds rows, not stages. Output: aggregate recall@3 per nprobe —
    //    the exact curve an index tuner plots before picking the
    //    latency/recall trade. Candidate sets nest by construction, so
    //    recall is non-decreasing in nprobe (pinned in
    //    `Round9bOpsSpec`). ──
    // ── v29: MMR diversity rerank (Carbonell & Goldstein 1998) — the
    //    retrieval-augmentation staple that turns a similarity top-k
    //    into a RELEVANT-AND-DIVERSE top-k: greedily pick argmax of
    //    λ·rel − (1−λ)·max-sim-to-already-picked (λ = 0.7) over the
    //    query's 50-strong candidate shortlist. Same exact-integer
    //    greedy-chain recipe as v28: relevance and similarity are
    //    micro-unit BIGINT cosines, the MMR score 7·rel − 3·smax is
    //    pure integer arithmetic with the vec_id argmax tie-break, and
    //    the per-candidate max-sim state folds one broadcast pick per
    //    round — so the judged 5-row rerank is bit-stable where float
    //    MMR would fork at the first ulp. Shortlist-bounded: rounds
    //    cost 50 rows each regardless of corpus size, because the
    //    candidate generator (here the exact top-50; any catalog ANN
    //    swaps in) already did the corpus-sized work. ──
    ("v29_mmr_rerank",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        val q = emb.where(col("vec_id") === 10)
          .select(col("embedding").as("q_emb"))
        val cand = emb.where(col("vec_id") =!= 10)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), col("embedding"),
            round(cosine(col("q_emb"), col("embedding")) * 1000000).cast("long")
              .as("rel_us"))
          .orderBy(col("rel_us").desc, col("vec_id")).limit(50)
          .persist()
        var state = cand.select(col("vec_id"), col("embedding"), col("rel_us"),
          lit(0L).as("smax_us"))
        var rows = Seq.empty[DataFrame]
        for (k <- 1 to 5) {
          val pick = state
            .select(col("vec_id"), col("embedding"), col("rel_us"),
              (lit(7L) * col("rel_us") - lit(3L) * col("smax_us")).as("mmr"))
            .orderBy(col("mmr").desc, col("vec_id")).limit(1).persist()
          rows = rows :+ pick.select(lit(k.toLong).as("rank"), col("vec_id"),
            col("rel_us"), col("mmr").as("mmr_score"))
          state = state
            .join(broadcast(pick.select(col("vec_id").as("p_id"))),
              col("vec_id") === col("p_id"), "left_anti")
            .crossJoin(broadcast(pick.select(col("embedding").as("p_emb"))))
            .select(col("vec_id"), col("embedding"), col("rel_us"),
              greatest(col("smax_us"),
                round(cosine(col("p_emb"), col("embedding")) * 1000000).cast("long"))
                .as("smax_us"))
            .coalesce(1).localCheckpoint() // shortlist-bounded (50 rows)
        }
        rows.reduce(_ union _).orderBy(col("rank"))
      },
      s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 10),
         |cand AS (
         |  SELECT e.vec_id, e.embedding,
         |         CAST(round(${cosineSql("q.q_emb", "e.embedding")} * 1000000, 0) AS BIGINT) AS rel_us
         |  FROM embeddings e, q WHERE e.vec_id <> 10
         |  ORDER BY rel_us DESC, e.vec_id LIMIT 50),
         |s0 AS (SELECT vec_id, embedding, rel_us,
         |              CAST(0 AS BIGINT) AS smax_us FROM cand),
         |${(1 to 5).map(mmrRoundCtes).mkString(",\n")}
         |SELECT rank, vec_id, rel_us, mmr_score FROM (
         |  ${(1 to 5).map(k =>
              s"SELECT CAST($k AS BIGINT) AS rank, vec_id, rel_us, mmr AS mmr_score FROM pk$k")
              .mkString("\n  UNION ALL ")}
         |) ORDER BY rank""".stripMargin),

    // ── v28: greedy k-center coreset — the farthest-point-first data
    //    selection classic (Gonzalez 1985; the 2-approximation behind
    //    coreset selection and active-learning batch picks): start from
    //    the min-id point, then 5× pick the point FARTHEST from the
    //    chosen set and fold its distances into the per-point min.
    //    Every quantity is an exact micro-unit BIGINT (squared L2 ×1e6
    //    with the vec_id argmax tie-break), so the chain of argmaxes is
    //    bit-stable on both engines — a float farthest-point chain
    //    would fork at the first ulp. The iterative-chain discipline:
    //    per-round state is ONE (vec_id, dmin) frame updated by a
    //    broadcast of the single new center and localCheckpoint'd, so
    //    round N costs the same corpus pass as round 1 and selection
    //    extends to any k. The judged artifact is the center table with
    //    its NON-INCREASING coverage radii — the curve a data-selection
    //    pipeline uses to choose k. ──
    ("v28_kcenter_coreset",
      (s: SparkSession, dir: String) => {
        val emb = Tables(s, dir, "embeddings").select(col("vec_id"), col("embedding"))
        val c1 = emb.join(broadcast(emb.agg(min(col("vec_id")).as("vec_id"))), "vec_id")
          .persist()
        var dmin = emb.crossJoin(broadcast(c1.select(col("embedding").as("c_emb"))))
          .select(col("vec_id"),
            round(subD2(col("embedding"), col("c_emb")) * 1000000).cast("long").as("dmin"))
          .localCheckpoint()
        var rows = Seq(c1.select(lit(1L).as("round"),
          col("vec_id").as("center_id"), lit(0L).as("radius_us")))
        for (k <- 2 to 6) {
          val pick = dmin.orderBy(col("dmin").desc, col("vec_id")).limit(1)
          val ck = emb.join(broadcast(pick.select(col("vec_id"),
            col("dmin").as("radius"))), "vec_id").persist()
          rows = rows :+ ck.select(lit(k.toLong).as("round"),
            col("vec_id").as("center_id"), col("radius").as("radius_us"))
          dmin = dmin.join(emb, "vec_id")
            .crossJoin(broadcast(ck.select(col("embedding").as("c_emb"))))
            .select(col("vec_id"),
              least(col("dmin"),
                round(subD2(col("embedding"), col("c_emb")) * 1000000).cast("long"))
                .as("dmin"))
            .localCheckpoint()
        }
        rows.reduce(_ union _).orderBy(col("round"))
      },
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
         |c1 AS (
         |  SELECT vec_id, embedding FROM e
         |  WHERE vec_id = (SELECT min(vec_id) FROM e)),
         |d1 AS (
         |  SELECT e.vec_id,
         |         CAST(round(${pqD2Sql("e.embedding", "c.embedding", "0", Dim)} * 1000000, 0) AS BIGINT) AS dmin
         |  FROM e, c1 c),
         |${(2 to 6).map(kcRoundCtes).mkString(",\n")}
         |SELECT CAST(1 AS BIGINT) AS round, vec_id AS center_id,
         |       CAST(0 AS BIGINT) AS radius_us FROM c1
         |${(2 to 6).map(k =>
            s"UNION ALL SELECT CAST($k AS BIGINT), vec_id, CAST(radius AS BIGINT) FROM c$k")
            .mkString("\n")}
         |ORDER BY round""".stripMargin),

    ("v27_multiprobe_recall_curve",
      (s: SparkSession, dir: String) => {
        val ranked = trainedRanked(s, dir)
        val assigned = ranked.where(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"),
            col("nrm"))
        val probes = ranked
          .where(col("vec_id") >= 10 && col("vec_id") < 20 && col("rn") <= 3)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("cent_id").as("cell"), col("nrm").as("q_nrm"), col("rn"))
          .withColumn("p", explode(expr("sequence(rn, 3)")))
        val wRank = Window.partitionBy(col("p"), col("q_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)
        val approx = broadcast(probes).join(assigned, Seq("cell"))
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")))
          .withColumn("rank", row_number().over(wRank))
          .where(col("rank") <= 3)
          .select(col("p"), col("q_id"), col("vec_id"))
        val emb = Tables(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding"), normCol(col("embedding")).as("nrm"))
        val qs = emb.where(col("vec_id") >= 10 && col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("nrm").as("q_nrm"))
        val wq = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)
        val exact = broadcast(qs).crossJoin(emb)
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")))
          .withColumn("rank", row_number().over(wq))
          .where(col("rank") <= 3)
          .select(col("q_id"), col("vec_id"))
          .persist()
        val hits = approx.join(exact, Seq("q_id", "vec_id"), "left_semi")
          .groupBy(col("p")).agg(count(lit(1)).as("n_hit"))
        s.range(1, 4).select(col("id").as("p"))
          .join(hits, Seq("p"), "left")
          .crossJoin(broadcast(exact.agg(count(lit(1)).as("k"))))
          .select(col("p").as("nprobe"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("k"),
            round(coalesce(col("n_hit"), lit(0L)).cast("double")
              / col("k").cast("double"), 4).as("recall"))
          .orderBy(col("nprobe"))
      },
      s"""WITH $ivfAssignCtes,
         |$ivfTrainedCtes,
         |probes AS (
         |  SELECT vec_id AS q_id, embedding AS q_emb, cent_id AS cell,
         |         nrm AS q_nrm, unnest(generate_series(rn, 3)) AS p
         |  FROM ranked1 WHERE vec_id >= 10 AND vec_id < 20 AND rn <= 3),
         |candp AS (
         |  SELECT pr.p, pr.q_id, e.vec_id,
         |         ${cosPreSql(dotFoldSql("pr.q_emb", "e.embedding", 64), "pr.q_nrm", "e.nrm")} AS cos
         |  FROM probes pr JOIN assigned1 e
         |    ON pr.cell = e.cell AND e.vec_id <> pr.q_id),
         |topp AS (
         |  SELECT p, q_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY p, q_id
         |              ORDER BY cos DESC, vec_id ASC) AS rank
         |    FROM candp) WHERE rank <= 3),
         |e9 AS (
         |  SELECT vec_id, embedding, ${normSql("embedding")} AS nrm FROM embeddings),
         |bq9 AS (
         |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm FROM e9
         |  WHERE vec_id >= 10 AND vec_id < 20),
         |bs9 AS (
         |  SELECT bq9.q_id, e9.vec_id,
         |         ${cosPreSql(dotFoldSql("bq9.q_emb", "e9.embedding", 64), "bq9.q_nrm", "e9.nrm")} AS cos
         |  FROM bq9, e9 WHERE e9.vec_id <> bq9.q_id),
         |exact9 AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |              ORDER BY cos DESC, vec_id ASC) AS rank
         |    FROM bs9) WHERE rank <= 3),
         |ks9 AS (SELECT CAST(count(*) AS BIGINT) AS k FROM exact9),
         |hits9 AS (
         |  SELECT t.p, CAST(count(*) AS BIGINT) AS n_hit
         |  FROM topp t WHERE EXISTS (
         |    SELECT 1 FROM exact9 x
         |    WHERE x.q_id = t.q_id AND x.vec_id = t.vec_id)
         |  GROUP BY 1),
         |spine AS (SELECT unnest(generate_series(1, 3)) AS p)
         |SELECT CAST(s.p AS BIGINT) AS nprobe,
         |       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit, ks9.k,
         |       round(CAST(coalesce(h.n_hit, 0) AS DOUBLE)
         |             / CAST(ks9.k AS DOUBLE), 4) AS recall
         |FROM spine s CROSS JOIN ks9
         |LEFT JOIN hits9 h ON h.p = s.p
         |ORDER BY nprobe""".stripMargin),

    // ── v32: the COMPOSED embedding pipeline — what a training-data
    //    vector stack actually runs, as ONE declarative plan: ingest →
    //    near-dup eviction (v04's 8-plane bucket join, cos ≥ 0.9,
    //    keep-min-id) → IVF index build on the DEDUPED corpus (v05's
    //    seed quantizer) → single-cell probe → recall@3 judged against
    //    the exact brute force over the SAME deduped corpus. The module
    //    twin of t20 (text), m10 (media) and g40 (geo): every stage is
    //    individually judged elsewhere; this row proves the CHAIN fuses
    //    and stays correct end-to-end. The dedup stage is made
    //    hash-OBSERVABLE by seeding 2×-scaled twins of the QUERY ids
    //    (10..19, offset +10^12): scaling by 2 is an exact exponent
    //    shift, so a twin lands in its query's hyperplane bucket AND its
    //    IVF cell (cosine scale-invariance) at cos = 1.0 — if eviction
    //    ever broke, the twin would surface as its query's rank-1
    //    neighbor on BOTH the probe and exact sides and flip the hash.
    //    Barriers: the bucketed frame (self-joined for pairs +
    //    anti-joined for survivors) and the survivor/assignment frames
    //    (each with multiple consumers) persist; everything between
    //    fuses — no parquet re-scan past ingest. At 100 TB each stage
    //    keeps its own judged scale shape: capped bucket join, broadcast
    //    centroids, broadcast query probe; only the labeled exact
    //    baseline is brute-force. ──
    ("v32_pipeline",
      (s: SparkSession, dir: String) => {
        val survivors = pipelineSurvivors(s, dir)
        val cents = survivors.where(col("vec_id") < 8)
          .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
        val wAssign = Window.partitionBy(col("vec_id"))
          .orderBy(col("ccos").desc, col("cent_id").asc)
        val assigned = survivors.crossJoin(broadcast(cents))
          .withColumn("ccos", cosine(col("embedding"), col("cent")))
          .withColumn("rn", row_number().over(wAssign))
          .where(col("rn") === 1)
          .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"),
            col("nrm"))
          .persist() // probed twice: query side + inverted-list side
        val queries = assigned.where(col("vec_id") >= 10 && col("vec_id") < 20)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
            col("cell"), col("nrm").as("q_nrm"))
        val wRank = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)
        val probe = broadcast(queries).join(assigned, Seq("cell"))
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")))
          .withColumn("rank", row_number().over(wRank))
          .where(col("rank") <= 3)
          .select(col("q_id"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("cos"))
        val wq = Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id").asc)
        val exact = survivors.crossJoin(broadcast(queries.drop("cell")))
          .where(col("vec_id") =!= col("q_id"))
          .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
            col("q_nrm"), col("nrm")))
          .withColumn("rank", row_number().over(wq))
          .where(col("rank") <= 3)
          .select(col("q_id"), col("vec_id"))
        val hits = probe.select(col("q_id"), col("vec_id"))
          .join(exact, Seq("q_id", "vec_id"), "left_semi")
          .groupBy(col("q_id")).agg(count(lit(1)).as("n_hit"))
        probe
          .join(exact.groupBy(col("q_id")).agg(count(lit(1)).as("k")), Seq("q_id"))
          .join(hits, Seq("q_id"), "left")
          .select(col("q_id"), col("rank"), col("vec_id"), col("cos"),
            coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("k"),
            round(coalesce(col("n_hit"), lit(0L)).cast("double")
              / col("k").cast("double"), 4).as("recall"))
          .orderBy(col("q_id"), col("rank"))
      },
      s"""WITH seeded AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000000000, list_transform(embedding, x -> x * CAST(2.0 AS FLOAT))
         |  FROM embeddings WHERE vec_id >= 10 AND vec_id < 20),
         |b AS (
         |  SELECT vec_id, embedding, ${bucketSql("embedding", 8)} AS bucket,
         |         ${normSql("embedding")} AS nrm FROM seeded
         |  QUALIFY count(*) OVER (PARTITION BY bucket) <= $BucketCap),
         |dups AS (
         |  SELECT DISTINCT b2.vec_id
         |  FROM b b1 JOIN b b2 ON b1.bucket = b2.bucket AND b1.vec_id < b2.vec_id
         |  WHERE ${cosPreSql(dotFoldSql("b1.embedding", "b2.embedding", 64), "b1.nrm", "b2.nrm")} >= 0.9),
         |sv AS (
         |  SELECT vec_id, embedding, nrm FROM b
         |  WHERE vec_id NOT IN (SELECT vec_id FROM dups)),
         |cents32 AS (
         |  SELECT vec_id AS cent_id, embedding AS cent FROM sv WHERE vec_id < 8),
         |cs32 AS (
         |  SELECT e.vec_id, e.embedding, e.nrm, c.cent_id,
         |         ${cosineSql("e.embedding", "c.cent")} AS ccos
         |  FROM sv e, cents32 c),
         |asg32 AS (
         |  SELECT vec_id, embedding, nrm, cent_id AS cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY vec_id
         |              ORDER BY ccos DESC, cent_id ASC) AS rn
         |    FROM cs32) WHERE rn = 1),
         |iq32 AS (
         |  SELECT vec_id AS q_id, embedding AS q_emb, cell, nrm AS q_nrm
         |  FROM asg32 WHERE vec_id >= 10 AND vec_id < 20),
         |cand32 AS (
         |  SELECT iq32.q_id, e.vec_id,
         |         ${cosPreSql(dotFoldSql("iq32.q_emb", "e.embedding", 64), "iq32.q_nrm", "e.nrm")} AS cos
         |  FROM iq32 JOIN asg32 e ON iq32.cell = e.cell AND e.vec_id <> iq32.q_id),
         |ivf32 AS (
         |  SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |              ORDER BY cos DESC, vec_id ASC) AS rank
         |    FROM cand32) WHERE rank <= 3),
         |bs32 AS (
         |  SELECT q.q_id, e.vec_id,
         |         ${cosPreSql(dotFoldSql("q.q_emb", "e.embedding", 64), "q.q_nrm", "e.nrm")} AS cos
         |  FROM iq32 q, sv e WHERE e.vec_id <> q.q_id),
         |exact32 AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY q_id
         |              ORDER BY cos DESC, vec_id ASC) AS rank
         |    FROM bs32) WHERE rank <= 3),
         |hits32 AS (
         |  SELECT i.q_id, count(*) AS n_hit
         |  FROM ivf32 i WHERE EXISTS (
         |    SELECT 1 FROM exact32 x WHERE x.q_id = i.q_id AND x.vec_id = i.vec_id)
         |  GROUP BY i.q_id),
         |ks32 AS (SELECT q_id, count(*) AS k FROM exact32 GROUP BY q_id)
         |SELECT i.q_id, i.rank, i.vec_id, i.cos,
         |       CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
         |       CAST(ks32.k AS BIGINT) AS k,
         |       round(CAST(coalesce(h.n_hit, 0) AS DOUBLE)
         |             / CAST(ks32.k AS DOUBLE), 4) AS recall
         |FROM ivf32 i JOIN ks32 ON i.q_id = ks32.q_id
         |LEFT JOIN hits32 h ON i.q_id = h.q_id
         |ORDER BY i.q_id, i.rank""".stripMargin)
  )

  /** v25's sign binarization: dims 1..32 → bits 0..31 of `lo`, dims
    * 33..64 → bits 0..31 of `hi` (two BIGINT halves — a single 64-bit
    * code would need bit 63, which signed shifts mangle differently
    * across engines). Pure integer CASE sums, identical in DuckDB. */
  private def signCode(emb: Column, from: Int): Column =
    (from until from + 32).map { i =>
      when(element_at(emb, i) >= 0f, lit(1L << (i - from))).otherwise(0L)
    }.reduce(_ + _)

  private def signCodeSql(emb: String, from: Int): String =
    (from until from + 32).map { i =>
      s"(CASE WHEN $emb[$i] >= 0 THEN ${1L << (i - from)} ELSE 0 END)"
    }.mkString(" + ")

  /** v25's Hamming probe, shared with the v26 recall evaluation: sign
    * codes for the whole corpus (one scan-shaped pass — the stored
    * index is 16 bytes/vector, a 256× compression of the float64
    * embedding), broadcast query codes, rank by popcount(xor) with the
    * vec_id tie-break. Returns (q_id, rank, vec_id, hamming),
    * unordered — judged callers add their own orderBy. */
  private def binaryTopK(s: SparkSession, dir: String): DataFrame = {
    val codes = Tables(s, dir, "embeddings")
      .select(col("vec_id"), signCode(col("embedding"), 1).as("lo"),
        signCode(col("embedding"), 33).as("hi"))
    val qs = codes.where(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("lo").as("q_lo"), col("hi").as("q_hi"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("hamming").asc, col("vec_id").asc)
    broadcast(qs).crossJoin(codes)
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("hamming",
        (bit_count(col("lo").bitwiseXOR(col("q_lo"))) +
          bit_count(col("hi").bitwiseXOR(col("q_hi")))).cast("long"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("hamming"))
  }

  /** Oracle CTE chain producing v25's (q_id, rank, vec_id, hamming) as
    * `bin` — shared by the v25 and v26 oracles. */
  private def binaryOracleCtes: String =
    s"""codes AS (
       |  SELECT vec_id,
       |         CAST(${signCodeSql("embedding", 1)} AS BIGINT) AS lo,
       |         CAST(${signCodeSql("embedding", 33)} AS BIGINT) AS hi
       |  FROM embeddings),
       |bq2 AS (
       |  SELECT vec_id AS q_id, lo AS q_lo, hi AS q_hi FROM codes
       |  WHERE vec_id >= 10 AND vec_id < 20),
       |hsc AS (
       |  SELECT bq2.q_id, c.vec_id,
       |         CAST(bit_count(xor(c.lo, bq2.q_lo))
       |              + bit_count(xor(c.hi, bq2.q_hi)) AS BIGINT) AS hamming
       |  FROM bq2, codes c WHERE c.vec_id <> bq2.q_id),
       |bin AS (
       |  SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, hamming FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY hamming ASC, vec_id ASC) AS rank
       |    FROM hsc) WHERE rank <= 3)""".stripMargin

  /** One v29 MMR round as oracle CTEs: argmax of 7·rel − 3·smax over
    * state `s{k-1}` → pick `pk$k` → state `s$k` with the picked row
    * dropped and every survivor's max-sim folded. */
  private def mmrRoundCtes(k: Int): String =
    s"""pk$k AS (
       |  SELECT vec_id, embedding, rel_us, 7 * rel_us - 3 * smax_us AS mmr
       |  FROM s${k - 1}
       |  ORDER BY mmr DESC, vec_id LIMIT 1),
       |s$k AS (
       |  SELECT s.vec_id, s.embedding, s.rel_us,
       |         greatest(s.smax_us,
       |                  CAST(round(${cosineSql("p.embedding", "s.embedding")} * 1000000, 0) AS BIGINT)) AS smax_us
       |  FROM s${k - 1} s, pk$k p
       |  WHERE s.vec_id <> p.vec_id)""".stripMargin

  /** One v28 greedy round as oracle CTEs: argmax of `d{k-1}` (dmin DESC,
    * vec_id tie-break) → center `c$k` with its radius → folded min-
    * distance frame `d$k`. */
  private def kcRoundCtes(k: Int): String =
    s"""p$k AS (SELECT vec_id, dmin FROM d${k - 1} ORDER BY dmin DESC, vec_id LIMIT 1),
       |c$k AS (
       |  SELECT e.vec_id, e.embedding, p.dmin AS radius
       |  FROM e JOIN p$k p USING (vec_id)),
       |d$k AS (
       |  SELECT d.vec_id,
       |         least(d.dmin,
       |               CAST(round(${pqD2Sql("e.embedding", "c.embedding", "0", Dim)} * 1000000, 0) AS BIGINT)) AS dmin
       |  FROM d${k - 1} d JOIN e ON e.vec_id = d.vec_id, c$k c)""".stripMargin

  /** v24's three power-iteration rounds. v₀ = 1/8 everywhere — exactly
    * unit norm (64·(1/8)² = 1) and an exact double on both engines. Each
    * round: dot per row → per-position scaled-long contribution sums
    * (the ONLY corpus-sized stage, localCheckpoint'd) → norm → rounded
    * re-normalized direction. */
  private def powerIteration(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings").select(col("embedding"))
    var v: DataFrame = s.range(1, Dim + 1)
      .select(col("id").as("pos"), lit(0.125).as("val"))
    var lastNrm: DataFrame = null
    for (_ <- 1 to 3) {
      val varr = v
        .agg(array_sort(collect_list(struct(col("pos"), col("val")))).as("pm"))
        .select(transform(col("pm"), x => x.getField("val")).as("v"))
      val u = emb.crossJoin(broadcast(varr))
        .select(col("embedding"),
          Portable.dotFold(col("embedding"), col("v")).as("dot"))
        .select(explode(transform(sequence(lit(1), lit(Dim)), i =>
          struct(i.cast("long").as("pos"),
            round(col("dot") * element_at(col("embedding"), i).cast("double") * 1000000)
              .cast("long").as("c")))).as("e"))
        .groupBy(col("e.pos").as("pos"))
        .agg(sum(col("e.c")).as("sc"))
        .select(col("pos"), (col("sc").cast("double") / 1000000.0).as("u"))
        .localCheckpoint()
      val nrm = u.agg(
        sqrt(sum(round(col("u") * col("u") * 1000000).cast("long")).cast("double")
          / 1000000.0).as("nrm"))
      lastNrm = nrm
      v = u.crossJoin(broadcast(nrm))
        .select(col("pos"),
          (round(col("u") / col("nrm") * 1000000).cast("long").cast("double")
            / 1000000.0).as("val"))
    }
    v.crossJoin(broadcast(lastNrm))
      .select(col("pos"), col("val").as("loading"), round(col("nrm"), 6).as("lambda"))
      .orderBy(col("pos"))
  }

  /** One unrolled power-iteration round as oracle CTEs: direction `prev`
    * (pos, val) → `v$k` (pos, val) + `n$k` (nrm) — the 1:1 twin of one
    * [[powerIteration]] loop body. */
  private def powerIterCtes(k: Int, prev: String): String =
    s"""a$k AS (SELECT list(val ORDER BY pos) AS v FROM $prev),
       |d$k AS (
       |  SELECT e.embedding, ${dotFoldSql("e.embedding", "a.v", Dim)} AS dot
       |  FROM embeddings e, a$k a),
       |c$k AS (
       |  SELECT i AS pos,
       |         CAST(sum(CAST(round(dot * CAST(embedding[CAST(i AS INT)] AS DOUBLE) * 1000000, 0) AS BIGINT)) AS BIGINT) AS sc
       |  FROM d$k, (SELECT unnest(generate_series(1, $Dim)) AS i)
       |  GROUP BY 1),
       |u$k AS (SELECT pos, CAST(sc AS DOUBLE) / 1000000.0 AS u FROM c$k),
       |n$k AS (
       |  SELECT sqrt(CAST(sum(CAST(round(u * u * 1000000, 0) AS BIGINT)) AS DOUBLE) / 1000000.0) AS nrm
       |  FROM u$k),
       |v$k AS (
       |  SELECT pos, CAST(CAST(round(u / n$k.nrm * 1000000, 0) AS BIGINT) AS DOUBLE) / 1000000.0 AS val
       |  FROM u$k, n$k)""".stripMargin

  /** v21's two-stage funnel, shared with the v22 recall evaluation.
    * Stage 1 is the v01 broadcast-queries × corpus sweep but folding
    * [[MrlDim]]-length prefixes (`slice` keeps the fold order identical
    * to the oracle's `generate_series(1, 16)` fold); stage 2 rescores
    * the per-query shortlist with the full-width native fold. Both
    * ranks tie-break on vec_id, so the shortlist and the final top-3
    * are deterministic on both engines. Returns (q_id, rank, vec_id,
    * cos), unordered — judged callers add their own orderBy. */
  private def mrlFunnel(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        slice(col("embedding"), 1, MrlDim).as("pfx"))
      .select(col("vec_id"), col("embedding"), col("pfx"),
        normCol(col("embedding")).as("nrm"),
        sqrt(dotNative(col("pfx"), col("pfx"))).as("pnrm"))
    val qs = emb.where(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("pfx").as("q_pfx"), col("nrm").as("q_nrm"), col("pnrm").as("q_pnrm"))
    val wP = Window.partitionBy(col("q_id"))
      .orderBy(col("pcos").desc, col("vec_id").asc)
    val wF = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(qs).crossJoin(emb)
      .where(col("vec_id") =!= col("q_id"))
      .withColumn("pcos", cosPre(dotNative(col("q_pfx"), col("pfx")),
        col("q_pnrm"), col("pnrm")))
      .withColumn("prank", row_number().over(wP))
      .where(col("prank") <= Shortlist)
      .withColumn("cos", cosPre(dotNative(col("q_emb"), col("embedding")),
        col("q_nrm"), col("nrm")))
      .withColumn("rank", row_number().over(wF))
      .where(col("rank") <= 3)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("cos"))
  }

  /** Oracle CTE chain producing v21's (q_id, rank, vec_id, cos) as
    * `mrl` — prefix-fold shortlist, full-fold rerank; shared by the
    * v21 and v22 oracles. CTE names are m-prefixed so [[recallTailSql]]
    * can append its own `e`/`bq`/... chain without collision. */
  private def mrlOracleCtes: String =
    s"""me AS (
       |  SELECT vec_id, embedding, ${normSql("embedding")} AS nrm,
       |         sqrt(${dotFoldSql("embedding", "embedding", MrlDim)}) AS pnrm
       |  FROM embeddings),
       |mq AS (
       |  SELECT vec_id AS q_id, embedding AS q_emb, nrm AS q_nrm, pnrm AS q_pnrm
       |  FROM me WHERE vec_id >= 10 AND vec_id < 20),
       |mshort AS (
       |  SELECT q_id, vec_id, q_emb, q_nrm, embedding, nrm FROM (
       |    SELECT mq.q_id, x.vec_id, mq.q_emb, mq.q_nrm, x.embedding, x.nrm,
       |           row_number() OVER (PARTITION BY mq.q_id ORDER BY
       |             ${cosPreSql(dotFoldSql("mq.q_emb", "x.embedding", MrlDim), "mq.q_pnrm", "x.pnrm")} DESC,
       |             x.vec_id ASC) AS prank
       |    FROM mq, me x WHERE x.vec_id <> mq.q_id)
       |  WHERE prank <= $Shortlist),
       |mrl AS (
       |  SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, cos FROM (
       |    SELECT q_id, vec_id,
       |           ${cosPreSql(dotFoldSql("q_emb", "embedding", Dim), "q_nrm", "nrm")} AS cos,
       |           row_number() OVER (PARTITION BY q_id ORDER BY
       |             ${cosPreSql(dotFoldSql("q_emb", "embedding", Dim), "q_nrm", "nrm")} DESC,
       |             vec_id ASC) AS rank
       |    FROM mshort) WHERE rank <= 3)""".stripMargin

  /** v19's IVFADC probe (the v05 coarse quantizer composed with the v16
    * PQ/ADC scorer), shared with the v20 recall evaluation. The index
    * BUILD is one scan-shaped pass: the coarse cell rides along from the
    * quantizer assignment into the subspace slicing, so codes and cell
    * land in the same row — exactly how a real index stores them — and
    * the plan never self-joins the corpus. Returns (q_id, rank, vec_id,
    * adc_us), unordered — judged callers add their own orderBy. */
  private def ivfPqTopK(s: SparkSession, dir: String): DataFrame = {
    val a = seedAssigned(s, dir)
    val codes0 = Tables(s, dir, "embeddings").where(col("vec_id") < 8)
      .select(col("vec_id").as("code_id"), subSlices(col("embedding")).as("e"))
      .select(col("e.j").as("j"), col("code_id"), col("e.sub").as("csub"))
    // compressed corpus: each vector's NSub code bytes, tagged with its
    // coarse cell — the stored index
    val asg = a
      .select(col("vec_id"), col("cell"), subSlices(col("embedding")).as("e"))
      .select(col("vec_id"), col("cell"), col("e.j").as("j"), col("e.sub").as("sub"))
      .join(broadcast(codes0), Seq("j"))
      .groupBy(col("vec_id"), col("cell"), col("j"))
      .agg(min(struct(subD2(col("sub"), col("csub")).as("d2"), col("code_id"))).as("w"))
      .select(col("vec_id"), col("cell"), col("j"), col("w.code_id").as("code_id"))
    // per-query ADC lookup table, tagged with the query's cell (the
    // probe target); 10 queries × NSub × 8 codes — broadcast-sized at
    // any corpus size
    val qtab = a.where(col("vec_id") >= 10 && col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("cell"), subSlices(col("embedding")).as("e"))
      .select(col("q_id"), col("cell"), col("e.j").as("j"), col("e.sub").as("qsub"))
      .join(broadcast(codes0), Seq("j"))
      .select(col("q_id"), col("cell"), col("j"), col("code_id"),
        round(subD2(col("qsub"), col("csub")) * 1000000).cast("long").as("ql"))
    val wRank = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_us"), col("vec_id"))
    asg.join(broadcast(qtab), Seq("cell", "j", "code_id"))
      .where(col("vec_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("ql")).as("adc_us"))
      .withColumn("rank", row_number().over(wRank))
      .where(col("rank") <= 5)
      .select(col("q_id"), col("rank").cast("long").as("rank"),
        col("vec_id"), col("adc_us"))
  }

  /** Oracle CTE chain producing v19's (q_id, rank, vec_id, adc_us) as
    * `ivfpq` — [[ivfAssignCtes]] + [[pqEncodeCtes]] + the cell-pruned
    * ADC score; shared by the v19 and v20 oracles. */
  private def ivfPqOracleCtes: String =
    s"""$ivfAssignCtes,
       |$pqEncodeCtes,
       |qcell AS (
       |  SELECT vec_id AS q_id, cell FROM assigned
       |  WHERE vec_id >= 10 AND vec_id < 20),
       |score AS (
       |  SELECT q.q_id, a.vec_id, CAST(sum(q.ql) AS BIGINT) AS adc_us
       |  FROM asg a
       |  JOIN assigned v ON v.vec_id = a.vec_id
       |  JOIN qcell qc ON qc.cell = v.cell
       |  JOIN qtab q ON q.q_id = qc.q_id AND q.j = a.j AND q.code_id = a.code_id
       |  WHERE a.vec_id <> qc.q_id
       |  GROUP BY 1, 2),
       |ivfpq AS (
       |  SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, adc_us FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |              ORDER BY adc_us, vec_id) AS rank
       |    FROM score) WHERE rank <= 5)""".stripMargin

  def queries: Map[String, Q] = catalog.map { case (n, q, _) => n -> q }.toMap
  def oracle: Map[String, String] = catalog.map { case (n, _, o) => n -> o }.toMap
}
