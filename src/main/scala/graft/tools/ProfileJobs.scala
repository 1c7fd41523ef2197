package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev probe (§1 measure-first): run one declared query and report its
  * Spark JOB/STAGE breakdown — job count, per-job wall, task counts —
  * so job-scheduling-bound queries (many small driver actions) are
  * distinguishable from compute-bound ones before any change is made.
  *
  * Usage: runMain graft.tools.ProfileJobs <query> [sfDir] [reps]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local(32, "graft-profile-jobs")
    val fn = SparkEntry.queries(name)

    final case class J(id: Int, var t0: Long = 0L, var t1: Long = 0L,
        var stages: Int = 0, var tasks: Int = 0, var desc: String = "")
    val jobs = scala.collection.mutable.LinkedHashMap.empty[Int, J]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = jobs.getOrElseUpdate(e.jobId, J(e.jobId))
        j.t0 = e.time
        j.stages = e.stageInfos.size
        j.tasks = e.stageInfos.map(_.numTasks).sum
        j.desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.t1 = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = ()
    }

    // warm-up rep (JIT/codegen), then measured reps with the listener
    fn(spark, dir).write.mode("overwrite").format("noop").save()
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { i =>
      jobs.clear()
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      val jobWall = jobs.values.map(j => math.max(0L, j.t1 - j.t0)).sum / 1e3
      println(f"[profile-jobs] $name rep$i wall=$wall%.2f s jobs=${jobs.size} " +
        f"sum_job_wall=$jobWall%.2f s")
      jobs.values.toSeq.sortBy(j => -(j.t1 - j.t0)).take(40).foreach { j =>
        println(f"  job ${j.id}%4d ${(j.t1 - j.t0) / 1e3}%7.3f s stages=${j.stages}%2d " +
          f"tasks=${j.tasks}%4d  ${j.desc.take(110)}")
      }
    }
    spark.stop()
  }
}
