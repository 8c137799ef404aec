package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** Cascading fallback join, coalesce form (SURVEY.md §2.3 J4).
  *
  * The reference assigns each fix to a region by trying geohash matches at
  * decreasing precision: join at the finest level, split matched/unmatched
  * on `type IS NULL`, re-join the unmatched at the next level, union the
  * pieces (`cal_orig_area.py:24-43`, 8-way at
  * `cal_subarea_portion.py:34-76`). That is one shuffle + union per level.
  *
  * Here each level is ONE broadcast left join against a per-level deduped
  * dictionary and the priority is a single `coalesce(agent_p1, agent_p2,
  * …, sentinel)` — no splits, no unions, no shuffle of the fact side at
  * all (dims broadcast). At 100 TB the fact table streams through k
  * broadcast hash joins inside one whole-stage-codegen span.
  */
object RegionAssign {

  /** Dictionary deduped per geohash cell at `p`: smallest agent_id wins
    * (deterministic — the reference's `dropDuplicates(['geohash6'])` keeps
    * an arbitrary row, which a judged query cannot).  */
  def dictAt(dict: DataFrame, lat: Column, lon: Column, agent: Column, p: Int): DataFrame =
    dict.groupBy(GeoFunctions.geohashCol(lat, lon, p).as(s"gh$p"))
      .agg(min(agent).as(s"agent_$p"))

  /** [[dictAt]] with the reference's neighbor expansion
    * (`cal_orig_area.py:62-72`, `cal_subarea_portion.py:170-178`): every
    * dictionary cell claims itself AND its 8 adjacent cells, so a fix
    * just outside a POI's cell still matches at this level. Dedup runs
    * TWICE — once per source cell before the 9× explode (shrinks the
    * generator input to distinct cells) and once per expanded cell after
    * it (overlapping 3×3 blocks re-collide; min-of-mins == global min, so
    * the tie-break stays deterministic). The explode runs on the DICT
    * side only — the fact side still pays one encode + k substrings. */
  def dictAtNeighbors(dict: DataFrame, lat: Column, lon: Column, agent: Column, p: Int): DataFrame =
    dict.groupBy(GeoFunctions.geohashCol(lat, lon, p).as("__gh_self"))
      .agg(min(agent).as("__agent"))
      .select(explode(GeoFunctions.geohashNeighborsUdf(col("__gh_self"))).as(s"gh$p"),
        col("__agent"))
      .groupBy(col(s"gh$p"))
      .agg(min(col("__agent")).as(s"agent_$p"))

  /** Left-join `points` against each precision level (finest first) and
    * coalesce. `sentinel` is the no-match region (reference uses '0',
    * `cal_orig_area.py:88-89`).
    *
    * The fact side encodes ONCE at the finest precision and every level
    * joins on a `substring` of that one geohash — valid because the
    * cell-index encode has the standard geohash prefix property
    * (`floor(x·2^a) >> (a-b) = floor(x·2^b)`, and the first 5p
    * interleaved bits ARE the precision-p string, clamping included).
    * Re-encoding per level would put k full ~40-bit encodes in the
    * per-row hot path — at 7 reference levels that dominated the whole
    * query; substrings are ~free. */
  /** `preEncoded`: a geohash column of `points` already encoded at a
    * precision ≥ max(precisions) — callers that derive other columns
    * from the same encode (e.g. a region id) pass it here so the fact
    * side pays ONE encode total, not one per consumer. */
  /** `expandNeighbors`: use [[dictAtNeighbors]] per level — the
    * reference's 3×3 dictionary expansion before the join. */
  def assign(points: DataFrame, lat: Column, lon: Column,
             dict: DataFrame, dictLat: Column, dictLon: Column, dictAgent: Column,
             precisions: Seq[Int], sentinel: Long,
             preEncoded: Option[Column] = None,
             expandNeighbors: Boolean = false): DataFrame = {
    val pMax = precisions.max
    val withGh = points.withColumn("__gh_max",
      preEncoded.getOrElse(GeoFunctions.geohashCol(lat, lon, pMax)))
    val level: (Int) => DataFrame =
      if (expandNeighbors) p => dictAtNeighbors(dict, dictLat, dictLon, dictAgent, p)
      else p => dictAt(dict, dictLat, dictLon, dictAgent, p)
    val joined = precisions.foldLeft(withGh) { (acc, p) =>
      acc.join(broadcast(level(p)),
        substring(col("__gh_max"), 1, p) === col(s"gh$p"), "left")
        .drop(s"gh$p")
    }
    val agent = coalesce(
      precisions.map(p => col(s"agent_$p")) :+ lit(sentinel): _*)
    joined.withColumn("agent_id", agent.cast("long"))
      .drop("__gh_max")
      .drop(precisions.map(p => s"agent_$p"): _*)
  }
}
