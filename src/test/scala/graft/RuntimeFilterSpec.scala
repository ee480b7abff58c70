package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime row-level filtering evidence: when one side of a shuffle join
  * is small and selectively filtered, Catalyst injects a bloom filter
  * built from the creation side into the application side's scan
  * (`BloomFilterMightContain`), pruning fact rows BEFORE the shuffle —
  * the engine-native version of the "bloom pre-filter before an
  * expensive join" pattern, and the reason the catalog never needs a
  * hand-rolled bloom UDF. Thresholds are scaled down to the fixture so
  * the rule fires at test size.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("selective dim filter injects a bloom runtime filter into the fact scan") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val orders = Tables.table(spark, sf, "orders")
        .filter(col("o_totalprice") > 500000)   // highly selective
      val lineitem = Tables.table(spark, sf, "lineitem")
      val j = lineitem.join(orders,
        col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter"),
        s"expected an injected bloom runtime filter:\n$plan")
      // and the filtered result is still correct
      val n = j.count()
      val expected = lineitem.join(
        Tables.table(spark, sf, "orders")
          .filter(col("o_totalprice") > 500000),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n === expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
