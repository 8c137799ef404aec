package graft

import org.apache.spark.sql.functions._

/** Contracts of the ledger TableCatalog (`graft.sources.GraftCatalog`)
  * beyond what the judged s24 roundtrip can show: replace really drops
  * the old rows, DROP TABLE removes the directory, the fixed-schema and
  * no-partition-transform gates reject bad DDL, rename moves the
  * directory, and the catalog-resolved read path is the SAME pruned
  * ledger scan the path API plans. */
class GraftCatalogSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Catalog plugins are cached by NAME on first reference (the
    * CatalogManager holds the initialized instance for the session), so
    * a per-test root under one shared name would silently keep the
    * FIRST test's root for every later test. Each invocation therefore
    * registers a UNIQUE catalog name, so the root handed to `body` is
    * the one the plugin actually initialized with. */
  private val catSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private def withCatalog[T](body: (String, String) => T): T = {
    val cat = s"cat_spec${catSeq.incrementAndGet()}"
    val root = graft.queries.Portable.scratchPath(
      s"catspec_${System.nanoTime()}")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    body(cat, root)
  }

  private def docs = graft.engine.Tables(spark, dir, "documents")
    .select(col("doc_id"), col("lang"), col("n_chars"))

  test("createOrReplace replaces — the first build's rows are gone") {
    withCatalog { (cat, _) =>
      docs.where(col("doc_id") < 50).writeTo(s"$cat.t1").createOrReplace()
      assert(spark.table(s"$cat.t1").count() == 50)
      docs.where(col("doc_id") >= 50 && col("doc_id") < 60)
        .writeTo(s"$cat.t1").createOrReplace()
      val after = spark.table(s"$cat.t1")
      assert(after.count() == 10, "replace kept the first build's rows")
      assert(after.agg(min(col("doc_id"))).collect()(0).getLong(0) == 50)
    }
  }

  test("append adds to the existing table; DROP TABLE removes it") {
    withCatalog { (cat, root) =>
      docs.where(col("doc_id") < 30).writeTo(s"$cat.t2").createOrReplace()
      docs.where(col("doc_id") >= 30 && col("doc_id") < 40)
        .writeTo(s"$cat.t2").append()
      assert(spark.table(s"$cat.t2").count() == 40)
      spark.sql(s"DROP TABLE $cat.t2")
      assert(!new java.io.File(root, "t2").exists(), "directory survived DROP")
      intercept[Exception] { spark.table(s"$cat.t2").count() }
    }
  }

  test("the fixed schema and the no-partition-transform gate bind") {
    withCatalog { (cat, _) =>
      intercept[Exception] {
        docs.select(col("doc_id"), col("lang")) // missing n_chars
          .writeTo(s"$cat.t3").createOrReplace()
      }
      intercept[Exception] {
        docs.writeTo(s"$cat.t4").partitionedBy(col("lang")).createOrReplace()
      }
    }
  }

  test("rename moves the table; reads resolve the new name only") {
    withCatalog { (cat, _) =>
      docs.where(col("doc_id") < 20).writeTo(s"$cat.t5").createOrReplace()
      // the rename TARGET resolves inside the source's catalog — a
      // $cat.t6 target would nest as the namespace again
      spark.sql(s"ALTER TABLE $cat.t5 RENAME TO t6")
      assert(spark.table(s"$cat.t6").count() == 20)
      intercept[Exception] { spark.table(s"$cat.t5").count() }
    }
  }

  test("catalog-resolved reads plan the connector's pruned scan (pushdown rides along)") {
    withCatalog { (cat, _) =>
      docs.repartitionByRange(4, col("doc_id"))
        .writeTo(s"$cat.t7").createOrReplace()
      val q = spark.table(s"$cat.t7").where(col("doc_id") < 5)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft-ledger"), plan)
      // the doc_id range filter compiles to the min/max file-skip test:
      // of the 4 range files only the lowest survives planning
      assert(q.rdd.getNumPartitions < 4,
        s"no file was skipped: ${q.rdd.getNumPartitions} partitions")
      assert(q.count() == 5)
    }
  }
}
