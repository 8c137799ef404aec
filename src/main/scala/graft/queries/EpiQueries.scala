package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.{Tables, Trajectory}
import Portable._

/** The reference's SIAR epidemic-model step (`1108Fit_para_multi.py`) —
  * its single largest artifact — re-expressed as a judged relational
  * pipeline over the engine's own mobility matrices.
  *
  * The reference alternates two operators over per-area compartment
  * vectors (S, I, A, R) for three age kinds (a/b/c = 0/1/2):
  *
  *  - the INFECTION step (`SIAR`, 1108Fit_para_multi.py:114-167):
  *    `EdS = -dt·susc·β·S·Σ_j m_kj·(I_j + α·A_j)/NUM_j` cross-kind
  *    mixing through a 3×3 contact matrix, split I/A by ratio r, plus
  *    `dt·γ` recoveries — per-area arithmetic, no joins at all;
  *  - the MOVE step (`Move`/`Move5`, :170-219): redistribute each
  *    compartment through the hourly mobility fraction matrix D (the
  *    g10b product, `D·X` per compartment) — a bounded matrix-vector
  *    product keyed by (src → dst).
  *
  * This is the deterministic MEAN-FIELD (expectation) form: the
  * reference's Poisson draws (`np.random.poisson`, :142-145) and
  * multinomial moves (`MultiNom2`, :188-207) are replaced by their
  * expectations, which is exactly the `E[·]` the reference's own
  * comments give for each transfer. All arithmetic is fixed-point
  * BIGINT (counts ×10⁴; the g19 recipe) so three chained infection
  * steps and two move steps hash-match an unrolled-CTE DuckDB oracle.
  *
  * Both engines run THE SAME generated expression text — the stage
  * templates below are rendered twice, differing only in the integer-
  * division operator (`DIV` vs `//`; identical semantics here since
  * every operand is non-negative) — so the two sides cannot drift.
  *
  * Scale: after the seed aggregation every table is bounded by
  * (#areas × 3), and the move matrices by #areas² non-zeros — all
  * independent of raw corpus size (the g19 property). The infection
  * step is whole-stage-codegen per-row arithmetic; the move step joins
  * a broadcast matrix. Fixed-point bounds: with counts ≤ N users,
  * the largest intermediate is `load·10⁶ ≤ N·10¹⁰`, overflow-free to
  * N ≈ 9·10⁸ users; past that, drop the ×10⁴ state scale a decimal.
  */
object EpiQueries {
  type Q = (SparkSession, String) => DataFrame

  private val Kinds = 0 to 2
  private val Comps = Seq("s", "i", "a", "r")
  /** Wide state columns: s0,i0,a0,r0,s1,…,r2 (kind-major). */
  private val stateCols: Seq[String] = Kinds.flatMap(k => Comps.map(c => s"$c$k"))

  /** Fixed-point model constants (mirroring 1108Fit_para_multi.py's
    * parameter block): susceptibility per kind 0.34/1.00/1.47
    * (`Year_structure`, :17-22), β=0.3/day, γ=0.2/day, α=0.55, r=0.15,
    * dt=1 h=1/24 day. Coef(k) = dt·β·susc_k ×10⁶ (exact: dt·β=0.0125);
    * GdMicro = dt·γ ×10⁶. */
  private val Coef = Seq(4250L, 12500L, 18375L)
  private val GdMicro = 8333L
  /** 3×3 contact matrix ×10³ (`RMij`, :48-69 builds it from POLYMOD
    * survey CSVs that are not part of the testdata; these are fixed
    * representative values with the same structure — strong in-group
    * contact, adult-dominated mixing). */
  private val M = Seq(Seq(7884L, 3851L, 601L),
                      Seq(2845L, 9700L, 1103L),
                      Seq(1520L, 4294L, 3114L))

  private def sparkDiv(a: String, b: String) = s"(($a) DIV ($b))"
  private def duckDiv(a: String, b: String) = s"(($a) // ($b))"

  /** Seed aggregation (`Info2SIAR`, :72-110): status counts per
    * (area, kind), ×10⁴ fixed point. Input rows carry (area, kind, hs)
    * where hs ∈ [0,100) is the user's deterministic status draw:
    * hs<4 → I, hs<10 → A, else S; R starts empty — patient-zero
    * seeding (`patient_zero`, :35-45) made deterministic. */
  private def seedAggExprs: Seq[String] =
    Kinds.flatMap { k => Seq(
      s"CAST(sum(CASE WHEN kind = $k AND hs >= 10 THEN 10000 ELSE 0 END) AS BIGINT) AS s$k",
      s"CAST(sum(CASE WHEN kind = $k AND hs < 4 THEN 10000 ELSE 0 END) AS BIGINT) AS i$k",
      s"CAST(sum(CASE WHEN kind = $k AND hs >= 4 AND hs < 10 THEN 10000 ELSE 0 END) AS BIGINT) AS a$k",
      s"CAST(sum(0) AS BIGINT) AS r$k")
    }

  /** The infection step as four narrow projection stages (each output
    * quantity is computed once, then referenced by name — inlining the
    * whole dataflow into one expression would repeat the mixing sum
    * nine times). Per kind k:
    *   fl_k  = (I_k + α·A_k)·10⁶ / NUM_k       (force of infection)
    *   nf_k  = min(S_k·Coef_k/10⁶ · Σ_j m_kj·fl_j /10⁹, S_k)  (E[new infections],
    *           clamped by S — the reference's probplace branch, :151-157)
    *   ti_k  = r·nf_k  (S→I), nf_k−ti_k (S→A)
    *   ri/ra = min(dt·γ·I_k, I_k) / min(dt·γ·A_k, A_k)  (recoveries,
    *           the reference's np.minimum clamp, :146-147)
    * Negative-clamps (`EdS2I[EdS2I<0]=0`, :135-140) are structural here:
    * every operand is non-negative by construction. */
  private def infectStages(div: (String, String) => String): Seq[Seq[String]] = {
    val pass = "area" +: stateCols
    val stage1 = pass ++ Kinds.map { k =>
      val num = s"(s$k + i$k + a$k + r$k)"
      val load = s"(i$k + ${div(s"55 * a$k", "100")})"
      s"CASE WHEN $num > 0 THEN ${div(s"$load * 1000000", num)} ELSE 0 END AS fl$k"
    }
    val stage2 = pass ++ Kinds.map { k =>
      val mix = div(Kinds.map(j => s"${M(k)(j)} * fl$j").mkString(" + "), "1000")
      s"least(${div(s"${div(s"s$k * ${Coef(k)}", "1000000")} * $mix", "1000000")}, s$k) AS nf$k"
    }
    val stage3 = pass ++ Kinds.flatMap { k => Seq(
      s"nf$k",
      s"${div(s"nf$k * 15", "100")} AS ti$k",
      s"least(${div(s"i$k * $GdMicro", "1000000")}, i$k) AS ri$k",
      s"least(${div(s"a$k * $GdMicro", "1000000")}, a$k) AS ra$k")
    }
    val stage4 = "area" +: Kinds.flatMap { k => Seq(
      s"s$k - nf$k AS s$k",
      s"i$k + ti$k - ri$k AS i$k",
      s"a$k + (nf$k - ti$k) - ra$k AS a$k",
      s"r$k + ri$k + ra$k AS r$k")
    }
    Seq(stage1, stage2, stage3, stage4)
  }

  /** Move-step aggregation exprs (expectation of `Move5`): each state
    * column redistributes as Σ_src (X_src·cnt)/tot grouped by dst; an
    * area with no matrix row keeps its mass (the `MultiNom2` no-
    * destination branch, :203-204 — LEFT JOIN + coalesce(dst, area)). */
  private def moveExprs(div: (String, String) => String): Seq[String] =
    stateCols.map { c =>
      s"CAST(sum(${div(s"p.$c * coalesce(m.cnt, 1)", "coalesce(m.tot, 1)")}) AS BIGINT) AS $c"
    }

  // ───────────────────────── Spark side ─────────────────────────

  /** Wide per-area seed state from the testdata (exposed for the
    * conservation spec). */
  private[graft] def seedWide(s: SparkSession, dir: String): DataFrame =
    seedWideFrom(Trajectory.hourlyState(Tables.events(s, dir)))

  private def seedWideFrom(st: DataFrame): DataFrame = {
    val first = st.groupBy(col("user_id"))
      .agg(min_by(col("region"), col("hour")).as("area"))
      .select(col("area"),
        pmod(portableHash(concat(lit("k"), col("user_id").cast("string"))), lit(3))
          .cast("int").as("kind"),
        pmod(portableHash(col("user_id").cast("string")), lit(100)).as("hs"))
    val aggs = seedAggExprs.map(expr)
    first.groupBy(col("area")).agg(aggs.head, aggs.tail: _*)
  }

  /** Infection step split at the transfer stage: (transfers, next) —
    * the transfers frame still carries nf/ti per kind, which is what
    * the reference's `Result` loop records as NI (dS2I sums, :246-249). */
  private[graft] def infectParts(state: DataFrame): (DataFrame, DataFrame) = {
    val stages = infectStages(sparkDiv)
    val pre = stages.take(3).foldLeft(state)((d, stage) => d.selectExpr(stage: _*))
    (pre, pre.selectExpr(stages(3): _*))
  }

  /** One mean-field infection step (exposed for the conservation spec:
    * S+I+A+R is invariant per (area, kind) — exactly, in integers). */
  private[graft] def infectStep(state: DataFrame): DataFrame =
    infectParts(state)._2

  /** The shared pipeline inputs: seed state + the two busiest hourly
    * move matrices (chosen in-plan; `mat(1)` is the chronologically
    * earlier of the two). One persisted hourly-state pass feeds BOTH
    * the seed and the transition matrices (the g10b sharing pattern);
    * od persists because it feeds the hour ranking AND both matrices. */
  private def siarInputs(s: SparkSession, dir: String): (DataFrame, Int => DataFrame) = {
    val st = Trajectory.hourlyState(Tables.events(s, dir)).persist()
    val od = Trajectory.transitions(st)
      .select(col("hour"), col("src"),
        when(col("dst") === "0", col("src")).otherwise(col("dst")).as("dst"))
      .groupBy(col("hour"), col("src"), col("dst"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    val hot = od.groupBy(col("hour")).agg(sum(col("cnt")).as("n"))
      .withColumn("rk", row_number().over(Window.orderBy(col("n").desc, col("hour"))))
      .where(col("rk") <= 2).select(col("hour"))
      .withColumn("ord", row_number().over(Window.orderBy(col("hour"))))
    // the two single-partition windows above rank #distinct-hours rows
    // (≈ 750/month) — bounded, never corpus-sized
    def mat(o: Int): DataFrame = od
      .join(broadcast(hot.where(col("ord") === o).select(col("hour"))), "hour")
      .select(col("src"), col("dst"), col("cnt"))
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(col("src"))))
    (seedWideFrom(st), mat)
  }

  /** One move step through a (src, dst, cnt, tot) matrix. The matrix is
    * #areas²-bounded — broadcastable at any corpus size. */
  private[graft] def moveStep(state: DataFrame, mat: DataFrame): DataFrame = {
    val aggs = moveExprs(sparkDiv).map(expr)
    state.alias("p")
      .join(broadcast(mat.alias("m")), expr("p.area = m.src"), "left")
      .groupBy(expr("coalesce(m.dst, p.area)").as("area"))
      .agg(aggs.head, aggs.tail: _*)
  }

  // ───────────────────────── DuckDB side ─────────────────────────

  private def infectSqlCtes(prefix: String, prev: String): (String, String) = {
    val names = Seq("a", "b", "c", "d").map(x => s"$prefix$x")
    val ctes = infectStages(duckDiv).zip(names).zip(prev +: names)
      .map { case ((exprs, nm), from) =>
        s"$nm AS (SELECT ${exprs.mkString(", ")} FROM $from)"
      }
    (ctes.mkString(",\n"), names.last)
  }

  private def moveSqlCte(name: String, prev: String, mat: String): String =
    s"""$name AS (
       |  SELECT coalesce(m.dst, p.area) AS area, ${moveExprs(duckDiv).mkString(", ")}
       |  FROM $prev p LEFT JOIN $mat m ON p.area = m.src
       |  GROUP BY 1)""".stripMargin

  /** The full unrolled CTE chain shared by the g22/g23 oracles. Stage-3
    * CTE of step N is `inNc` (carries nf/ti per kind), post-move states
    * are `mv1`/`mv2`, the final state is `in3d`. */
  private def siarOracleCtes: String = {
    val (in1, o1) = infectSqlCtes("in1", "w0")
    val (in2, o2) = infectSqlCtes("in2", "mv1")
    val (in3, _) = infectSqlCtes("in3", "mv2")
    s"""${Trajectory.trajSqlPrelude},
       |seq AS (
       |  SELECT user_id, hour, region,
       |         lag(region) OVER (PARTITION BY user_id ORDER BY hour) AS src
       |  FROM traj),
       |od AS (
       |  SELECT hour, src, CASE WHEN region = '0' THEN src ELSE region END AS dst,
       |         CAST(count(*) AS BIGINT) AS cnt
       |  FROM seq WHERE src IS NOT NULL GROUP BY 1, 2, 3),
       |hot AS (
       |  SELECT hour, row_number() OVER (ORDER BY hour) AS ord FROM (
       |    SELECT hour FROM (SELECT hour, sum(cnt) AS n FROM od GROUP BY 1)
       |    QUALIFY row_number() OVER (ORDER BY n DESC, hour) <= 2)),
       |mat1 AS (
       |  SELECT src, dst, cnt, sum(cnt) OVER (PARTITION BY src) AS tot
       |  FROM od JOIN hot ON od.hour = hot.hour AND hot.ord = 1),
       |mat2 AS (
       |  SELECT src, dst, cnt, sum(cnt) OVER (PARTITION BY src) AS tot
       |  FROM od JOIN hot ON od.hour = hot.hour AND hot.ord = 2),
       |sd AS (
       |  SELECT arg_min(region, hour) AS area,
       |         CAST(${portableHashSql("'k' || CAST(user_id AS VARCHAR)")} % 3 AS INT) AS kind,
       |         ${portableHashSql("CAST(user_id AS VARCHAR)")} % 100 AS hs
       |  FROM st GROUP BY user_id),
       |w0 AS (SELECT area, ${seedAggExprs.mkString(", ")} FROM sd GROUP BY 1),
       |$in1,
       |${moveSqlCte("mv1", o1, "mat1")},
       |$in2,
       |${moveSqlCte("mv2", o2, "mat2")},
       |$in3""".stripMargin
  }

  val catalog: Seq[(String, Q, String)] = Seq(

    // ── g22: three infection steps interleaved with two move steps
    //    through the two busiest hourly mobility matrices (chosen
    //    in-plan, deterministically: top-2 hours by transition count,
    //    applied chronologically — the reference cycles D hour-by-hour
    //    through its 168-matrix week, :246-257). ──
    ("g22_siar_step",
      (s: SparkSession, dir: String) => {
        val (s0, mat) = siarInputs(s, dir)
        val fin = infectStep(moveStep(infectStep(moveStep(infectStep(s0),
          mat(1))), mat(2)))
        val kindStructs = Kinds.map { k =>
          struct(lit(k).cast("long").as("kind") +:
            Comps.map(c => col(s"$c$k").as(c)): _*)
        }
        fin.select(col("area"), explode(array(kindStructs: _*)).as("e"))
          .select(col("area") +: ("kind" +: Comps).map(c => col(s"e.$c").as(c)): _*)
          .orderBy(col("area"), col("kind"))
      },
      s"""$siarOracleCtes
         |SELECT area, CAST(k AS BIGINT) AS kind,
         |       ${Comps.map(c => s"CASE k WHEN 0 THEN ${c}0 WHEN 1 THEN ${c}1 ELSE ${c}2 END AS $c").mkString(", ")}
         |FROM in3d, (SELECT unnest(generate_series(0, 2)) AS k)
         |ORDER BY area, kind""".stripMargin),

    // ── g23: the reference's `Result` observable series
    //    (1108Fit_para_multi.py:233-270) — per step, the global
    //    compartment totals recorded AFTER the move (resulta/b/c sums)
    //    and the new-infection count NI = Σ dS2I (:246-249; the final
    //    step has no move, mirroring the loop's k = step-1 exit). The
    //    entire series reduces to three 1-row aggregates over the
    //    area-bounded chain — the epidemic-curve artifact the paper
    //    fits β against, never materialized on the driver. ──
    ("g23_siar_series",
      (s: SparkSession, dir: String) => {
        val (s0, mat) = siarInputs(s, dir)
        // each chain frame has TWO consumers (its own step aggregate and
        // the next stage), and a frame is #areas × #cols — persist all
        // five so the six 1-row aggregate branches don't re-run the seed
        // agg and matrix windows once per branch (cache substitution
        // applies to the already-built derived plans)
        val (t1, i1) = infectParts(s0)
        t1.persist()
        val m1 = moveStep(i1, mat(1)).persist()
        val (t2, i2) = infectParts(m1)
        t2.persist()
        val m2 = moveStep(i2, mat(2)).persist()
        val (t3, i3) = infectParts(m2)
        t3.persist()
        def stepRow(step: Int, state: DataFrame, transfers: DataFrame): DataFrame = {
          val tots = Comps.map(c => expr(
            s"CAST(${Kinds.map(k => s"sum($c$k)").mkString(" + ")} AS BIGINT) AS $c"))
          val ni = transfers.agg(expr(
            s"CAST(${Kinds.map(k => s"sum(ti$k)").mkString(" + ")} AS BIGINT) AS new_i"))
          state.agg(tots.head, tots.tail: _*)
            .crossJoin(ni)
            .select(lit(step).cast("long").as("step") +:
              ("new_i" +: Comps).map(col): _*)
        }
        stepRow(1, m1, t1)
          .unionByName(stepRow(2, m2, t2))
          .unionByName(stepRow(3, i3, t3))
          .orderBy(col("step"))
      },
      {
        def stepSql(step: Int, state: String, stage3: String) =
          s"""SELECT CAST($step AS BIGINT) AS step,
             |       (SELECT CAST(${Kinds.map(k => s"sum(ti$k)").mkString(" + ")} AS BIGINT) FROM $stage3) AS new_i,
             |       ${Comps.map(c => s"CAST(${Kinds.map(k => s"sum($c$k)").mkString(" + ")} AS BIGINT) AS $c").mkString(", ")}
             |FROM $state""".stripMargin
        s"""$siarOracleCtes
           |${stepSql(1, "mv1", "in1c")}
           |UNION ALL
           |${stepSql(2, "mv2", "in2c")}
           |UNION ALL
           |${stepSql(3, "in3d", "in3c")}
           |ORDER BY step""".stripMargin
      })
  )

  def queries: Map[String, Q] = catalog.map { case (n, q, _) => n -> q }.toMap
  def oracle: Map[String, String] = catalog.map { case (n, _, o) => n -> o }.toMap
}
