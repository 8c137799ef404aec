package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe main for local iteration (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val ev = graft.engine.Tables.events(spark, dir)
    val tmp = "target/tmp/scratch_dpp"
    ev.withColumn("event_date", to_date($"ts"))
      .write.mode("overwrite").partitionBy("event_date").parquet(tmp)
    val part = spark.read.parquet(tmp)
    val dim = ev.where($"user_id" <= 3)
      .select(to_date($"ts").as("d")).distinct()
    val j = part.join(broadcast(dim), part("event_date") === dim("d"))
      .groupBy($"event_date").agg(count(lit(1)).as("n"))
    j.write.mode("overwrite").format("noop").save()
    val plan = j.queryExecution.executedPlan.toString
    println("HAS_DPP=" + plan.toLowerCase.contains("dynamicpruning"))
    println("ROWS=" + j.count())
    spark.stop()
  }
}
