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

  private def withCatalog[T](body: String => T): T = {
    val root = graft.queries.Portable.scratchPath(
      s"catspec_${System.nanoTime()}")
    spark.conf.set("spark.sql.catalog.cat_spec", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cat_spec.root", root)
    body(root)
  }

  private def docs = graft.engine.Tables(spark, dir, "documents")
    .select(col("doc_id"), col("lang"), col("n_chars"))

  test("createOrReplace replaces — the first build's rows are gone") {
    withCatalog { _ =>
      docs.where(col("doc_id") < 50).writeTo("cat_spec.t1").createOrReplace()
      assert(spark.table("cat_spec.t1").count() == 50)
      docs.where(col("doc_id") >= 50 && col("doc_id") < 60)
        .writeTo("cat_spec.t1").createOrReplace()
      val after = spark.table("cat_spec.t1")
      assert(after.count() == 10, "replace kept the first build's rows")
      assert(after.agg(min(col("doc_id"))).collect()(0).getLong(0) == 50)
    }
  }

  test("append adds to the existing table; DROP TABLE removes it") {
    withCatalog { root =>
      docs.where(col("doc_id") < 30).writeTo("cat_spec.t2").createOrReplace()
      docs.where(col("doc_id") >= 30 && col("doc_id") < 40)
        .writeTo("cat_spec.t2").append()
      assert(spark.table("cat_spec.t2").count() == 40)
      spark.sql("DROP TABLE cat_spec.t2")
      assert(!new java.io.File(root, "t2").exists(), "directory survived DROP")
      intercept[Exception] { spark.table("cat_spec.t2").count() }
    }
  }

  test("the fixed schema and the no-partition-transform gate bind") {
    withCatalog { _ =>
      intercept[Exception] {
        docs.select(col("doc_id"), col("lang")) // missing n_chars
          .writeTo("cat_spec.t3").createOrReplace()
      }
      intercept[Exception] {
        docs.writeTo("cat_spec.t4").partitionedBy(col("lang")).createOrReplace()
      }
    }
  }

  test("rename moves the table; reads resolve the new name only") {
    withCatalog { _ =>
      docs.where(col("doc_id") < 20).writeTo("cat_spec.t5").createOrReplace()
      // the rename TARGET resolves inside the source's catalog — a
      // cat_spec.t6 target would nest as namespace "cat_spec" again
      spark.sql("ALTER TABLE cat_spec.t5 RENAME TO t6")
      assert(spark.table("cat_spec.t6").count() == 20)
      intercept[Exception] { spark.table("cat_spec.t5").count() }
    }
  }

  test("catalog-resolved reads plan the connector's pruned scan (pushdown rides along)") {
    withCatalog { _ =>
      docs.repartitionByRange(4, col("doc_id"))
        .writeTo("cat_spec.t7").createOrReplace()
      val q = spark.table("cat_spec.t7").where(col("doc_id") < 5)
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
