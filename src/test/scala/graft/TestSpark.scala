package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Shared local session for specs. */
object TestSpark {
  lazy val spark: SparkSession = {
    val warehouse = Files.createTempDirectory("graft_warehouse_").toString
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", warehouse)
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
