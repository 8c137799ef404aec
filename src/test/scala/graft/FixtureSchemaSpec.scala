package graft

import graft.engine.Tables

/** Fixture-drift tripwire (the round-7 postmortem): the driver regenerated
  * `/root/testdata` mid-build and silently re-encoded `events.ts` from
  * parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS) — 93 queries and 141
  * tests then failed with the SAME unreadable AnalysisException. This
  * spec turns the next such drift into one line that names the drifted
  * column: `fixtures changed: events.ts is now X`.
  *
  * The timestamp columns accept every encoding `Tables.normalizeTs` can
  * dispatch on (the contract is "adaptively readable", not one physical
  * type); everything else is pinned to the exact scanned type from
  * FIXTURES.md §A. */
class FixtureSchemaSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Acceptable `DataType.simpleString` renderings per column. */
  private val tsEnc = Set("bigint", "timestamp", "timestamp_ntz")
  private val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq(
      "n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq(
      "c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq(
      "s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq(
      "p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq(
      "o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> tsEnc, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq(
      "l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> tsEnc),
    "events" -> Seq(
      "event_id" -> Set("bigint"), "ts" -> tsEnc,
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq(
      "doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq(
      "vec_id" -> Set("bigint"), "embedding" -> Set("array<float>"),
      "label" -> Set("int")))

  test("fixtures: every table still carries the contracted columns and types") {
    val drift = Tables.names.flatMap { t =>
      expected.get(t) match {
        case None =>
          // a table added to the catalog but not to this map must still
          // produce a one-line named diagnosis, not a NoSuchElementException
          Seq(s"fixtures changed: catalog table $t has no expected schema " +
            "here — add it to FixtureSchemaSpec")
        case Some(want) =>
          // the RAW scan, pre-normalization — the tripwire must see what the
          // parquet files actually carry, not what normalizeTs makes of it
          val df = if (t == "events") Tables.rawEvents(spark, dir)
                   else spark.read.parquet(s"$dir/$t.parquet")
          val actual = df.schema.map(f => f.name -> f.dataType.simpleString)
          val wantNames = want.map(_._1).toSet
          val missing = want.collect {
            case (c, _) if !actual.exists(_._1 == c) =>
              s"fixtures changed: $t.$c is MISSING"
          }
          val extra = actual.collect {
            case (c, ty) if !wantNames.contains(c) =>
              s"fixtures changed: $t has NEW column $c ($ty)"
          }
          val retyped = want.flatMap { case (c, ok) =>
            actual.collectFirst {
              case (`c`, ty) if !ok.contains(ty) =>
                s"fixtures changed: $t.$c is now $ty (expected ${ok.mkString(" | ")})"
            }
          }
          missing ++ extra ++ retyped
      }
    } ++ (expected.keySet -- Tables.names.toSet).toSeq.sorted.map(t =>
      s"fixtures changed: expected table $t is no longer in Tables.names")
    assert(drift.isEmpty, "\n" + drift.mkString("\n"))
  }
}
