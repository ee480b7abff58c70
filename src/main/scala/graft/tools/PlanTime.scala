package graft.tools

import org.apache.spark.sql.SparkSession

/** Split each catalog query's fixed cost into DRIVER-side planning
  * (fn() DataFrame construction + analysis + optimization + physical
  * planning, no execution) vs everything else: at bench SF the tables
  * are small, so a query whose wall time stays high after its executor
  * work shrinks is usually Catalyst-bound (huge unioned/iterated
  * logical plans), and the fix is plan truncation, not shuffle work.
  *
  *   java -cp ... graft.tools.PlanTime [query ...]   (default: all)
  *   Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_REPS (default 2)
  *
  * NOTE: fn() may trigger mirror builds / Materialize counts (eager
  * actions) — those show up in the `build` column, separating them from
  * pure `plan` time (sparkPlan resolution on the returned frame).
  */
object PlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val queries = graft.SparkEntry.queries
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.catalog.map(_._1)
    // warm codegen/paths once
    names.foreach { n =>
      try queries(n)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => }
      finally spark.sqlContext.clearCache()
    }
    println(f"${"query"}%-40s ${"build_ms"}%9s ${"plan_ms"}%9s ${"exec_ms"}%9s")
    names.foreach { n =>
      var bBuild, bPlan, bExec = Double.MaxValue
      (1 to reps).foreach { _ =>
        try {
          val t0 = System.nanoTime()
          val df = queries(n)(spark, sfDir)
          val t1 = System.nanoTime()
          df.queryExecution.executedPlan // force full planning
          val t2 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val t3 = System.nanoTime()
          bBuild = math.min(bBuild, (t1 - t0) / 1e6)
          bPlan = math.min(bPlan, (t2 - t1) / 1e6)
          bExec = math.min(bExec, (t3 - t2) / 1e6)
        } catch { case e: Throwable =>
          System.err.println(s"[plantime] $n failed: ${e.getMessage}")
        } finally spark.sqlContext.clearCache()
      }
      println(f"$n%-40s $bBuild%9.1f $bPlan%9.1f $bExec%9.1f")
    }
    spark.stop()
  }
}
