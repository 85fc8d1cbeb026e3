package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev tool (guide §1): per-JOB wall breakdown for one query — job count,
  * each job's duration + description, and the DRIVER GAPS between jobs
  * (planning, file listing, checkpoint commits — the fixed overhead the
  * st-tier pays per micro-batch). Not part of the driver contract.
  * Usage: runMain graft.Profile <queryName> [queryName ...]
  */
object Profile {
  private case class J(id: Int, start: Long, var end: Long, desc: String)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new ConcurrentLinkedQueue[J]()
    val byId = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val stages = new ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val dur = (for {a <- si.completionTime; b <- si.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        val m = si.taskMetrics
        stages.add(f"stage ${si.stageId}%4d dur=$dur%7.2f tasks=${si.numTasks}%4d " +
          f"in=${m.inputMetrics.bytesRead / 1e6}%9.1fMB sh_r=${m.shuffleReadMetrics.totalBytesRead / 1e6}%9.1fMB " +
          f"sh_w=${m.shuffleWriteMetrics.bytesWritten / 1e6}%9.1fMB exec=${m.executorRunTime / 1e3}%8.1fs " +
          f"${si.name.takeWhile(_ != '\n').take(70)}")
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val sites = e.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
        val d = s"${e.stageInfos.size}st " + sites.take(3).mkString(" | ")
        val j = J(e.jobId, System.nanoTime(), 0L, d)
        byId.put(e.jobId, j); jobs.add(j)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(byId.get(e.jobId)).foreach(_.end = System.nanoTime())
      }
    })

    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      run(fn(spark, sfDir)) // warmup (artifact builds, codegen)
      jobs.clear(); byId.clear(); stages.clear()
      val t0 = System.nanoTime()
      run(fn(spark, sfDir))
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val js = jobs.iterator().asScala.toSeq.sortBy(_.start)
      println(s"===== $name wall=${f"$wall%.3f"}s jobs=${js.size}")
      var prevEnd = t0
      js.foreach { j =>
        val gap = (j.start - prevEnd) / 1e9
        val dur = (math.max(j.end, j.start) - j.start) / 1e9
        prevEnd = math.max(prevEnd, j.end)
        println(f"  job ${j.id}%4d gap=$gap%7.3f dur=$dur%7.3f  ${j.desc.take(110)}")
      }
      val jobSum = js.map(j => (math.max(j.end, j.start) - j.start) / 1e9).sum
      println(f"  ---- jobSum=$jobSum%.3f wall=$wall%.3f driverGap≈${wall - jobSum}%.3f")
      if (sys.env.contains("SPARK_GRAFT_STAGES")) {
        import scala.jdk.CollectionConverters._
        stages.iterator().asScala.foreach(s => println("  " + s))
      }
    }
    spark.stop()
  }
}
