package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.TextOps._

/** Task-metric instrumentation: where does wall-clock go? */
object ProfileTasks {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val nTasks = new AtomicInteger
    val runMs = new AtomicLong
    val cpuNs = new AtomicLong
    val maxMs = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        nTasks.incrementAndGet()
        runMs.addAndGet(t.taskMetrics.executorRunTime)
        cpuNs.addAndGet(t.taskMetrics.executorCpuTime)
        maxMs.getAndUpdate(m => math.max(m, t.taskMetrics.executorRunTime))
      }
    })

    def time(name: String)(body: => Any): Unit = {
      nTasks.set(0); runMs.set(0); cpuNs.set(0); maxMs.set(0)
      val t0 = System.nanoTime()
      val r = body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      println(f"$name: wall=$wall%.2fs tasks=${nTasks.get} " +
        f"sumRun=${runMs.get / 1e3}%.2fs sumCpu=${cpuNs.get / 1e9}%.2fs " +
        f"maxTask=${maxMs.get / 1e3}%.2fs ($r)")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").repartition(32)
    val sh = docs
      .select(col("doc_id"), explode(shingles3(tokens(col("text")))).as("shs"))
      .select(col("doc_id"), hash32(col("shs")).as("sh"))

    time("docs.count  ") { docs.count() }
    time("sh.count  r1") { sh.count() }
    time("sh.count  r2") { sh.count() }
    time("jaccard full") {
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("i"))
      val sa = sizes.select(col("doc_id").as("doc_a"), col("n").as("na"))
      val sb = sizes.select(col("doc_id").as("doc_b"), col("n").as("nb"))
      inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", col("i") * 1.0 / (col("na") + col("nb") - col("i")))
        .filter(col("jaccard") >= 0.8).count()
    }
    spark.stop()
  }
}
