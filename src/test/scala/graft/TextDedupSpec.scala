package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import graft.queries.TextQueries

/** Pins the skew-guard ("df cap") semantics of the pair-generating
  * dedup queries against a constructed hot-key corpus:
  *
  *   - t08: a shingle whose document frequency exceeds DfCap is dropped
  *     from pair generation, so a pair whose Jaccard clears the threshold
  *     ONLY via that boilerplate shingle is never materialized, while
  *     pairs sharing rare shingles are unaffected;
  *   - t06: an LSH band key shared by more docs than BandCap produces no
  *     candidates (an exact-duplicate explosion is t05's job, not the
  *     near-dup join's), while small buckets keep pairing.
  *
  * On the judged testdata no key comes near the caps (max df observed: 6
  * at sf0.1), so CORRECTNESS's cap-free DuckDB oracles already prove the
  * caps don't change judged output; this spec proves they DO bound the
  * quadratic bucket when a hot key exists.
  */
class TextDedupSpec extends SparkSpec {

  /** Writes `docs` as `documents.parquet` under a temp dir and runs the
    * named judged query against it. All doc_ids are >= 10 so the t08
    * seeding branch (copies of doc_id < 10) adds nothing. */
  private def run(name: String, docs: Seq[(Long, String, String)]): DataFrame = {
    val dir = Files.createTempDirectory("graft_dedup_spec").toString
    val s = spark
    import s.implicits._
    docs.toDF("doc_id", "source", "text")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    TextQueries.queries(name)(spark, dir)
  }

  test("t08: a shingle over the df cap stops pairing; rare shingles still pair") {
    // 70 filler docs + A + B all share the shingle "hot hot hot"
    // (df = 72 > DfCap = 64); every other shingle is unique per doc.
    val filler = (0 until 70).map { i =>
      (100L + i, "web", s"hot hot hot f${i}a f${i}b")
    }
    // A(500) and B(501) share ONLY the hot shingle: 1 of 5 distinct
    // shingles => J = 0.2, exactly at the threshold WITHOUT the cap.
    val hotOnly = Seq(
      (500L, "web", "hot hot hot a1 a2"),
      (501L, "web", "hot hot hot b1 b2"))
    // C(600) and D(601) are exact twins over rare shingles => J = 1.0.
    val genuine = Seq(
      (600L, "web", "alpha beta gamma delta"),
      (601L, "web", "alpha beta gamma delta"))
    val out = run("t08_ngram_jaccard", filler ++ hotOnly ++ genuine)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((600L, 601L)), out.mkString(", "))
  }

  test("t10 and t10b label components identically (propagation vs star rewiring)") {
    val dir = "/root/testdata/sf0.001"
    def labels(name: String) = TextQueries.queries(name)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val prop = labels("t10_dup_clusters")
    val star = labels("t10b_dup_clusters_star")
    assert(prop.nonEmpty) // seeded corpus guarantees components
    assert(prop === star)
  }

  test("t07: a simhash band key over the band cap produces no candidates; small buckets pair") {
    // 70 exact copies: identical 60-bit sketches, so every one of the 4
    // 15-bit band keys has multiplicity 70 > BandCap = 64 -> zero pairs
    // from the cluster (2415 without the cap).
    val cluster = (0 until 70).map { i =>
      (100L + i, "web", "x1 x2 x3 x4 x5 x6")
    }
    // One twin pair outside the cluster: band multiplicity 2, Hamming 0.
    val twins = Seq(
      (300L, "web", "q1 q2 q3 q4 q5"),
      (301L, "web", "q1 q2 q3 q4 q5"))
    val out = run("t07_dedup_simhash", cluster ++ twins)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((300L, 301L)), out.mkString(", "))
  }

  test("t06: a band key over the band cap produces no candidates; small buckets pair") {
    // 70 exact copies: identical MinHash signatures, so every one of the
    // 4 band keys has multiplicity 70 > BandCap = 64 -> zero pairs from
    // the cluster (2415 without the cap).
    val cluster = (0 until 70).map { i =>
      (100L + i, "web", "x1 x2 x3 x4 x5 x6")
    }
    // One twin pair outside the cluster: band multiplicity 2, J = 1.0.
    val twins = Seq(
      (300L, "web", "q1 q2 q3 q4 q5"),
      (301L, "web", "q1 q2 q3 q4 q5"))
    val out = run("t06_dedup_minhash", cluster ++ twins)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet === Set((300L, 301L)), out.mkString(", "))
  }
}
