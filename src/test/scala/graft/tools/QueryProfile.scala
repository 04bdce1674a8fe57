package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-query structural profile: wall time plus Spark job/stage/task counts
  * and per-job wall times, under the SAME session configuration as
  * graft.Bench. The optimization rounds need to know whether a query's
  * seconds are data work or fixed per-job overhead (round-trip-dominated
  * ladders, iterative operators) before touching anything — guide §1.
  *
  * Usage: sbt 'Test/runMain graft.tools.QueryProfile <sfDir> <q1> [q2 ...]'
  * Each query runs once untimed (warmup: plan, codegen, JIT, page cache,
  * engine build) and once timed with listener counters reset.
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "pass at least one query name")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = mutable.ArrayBuffer.empty[(Int, Long, String)] // id, t0, desc
    val jobWall = mutable.ArrayBuffer.empty[(Int, Double, String)]
    val stageToJob = mutable.Map.empty[Int, Int]
    val jobTaskMs = mutable.Map.empty[Int, Long].withDefaultValue(0L)
    val jobTasks = mutable.Map.empty[Int, Int].withDefaultValue(0)
    var stages = 0
    var tasks = 0L
    var taskTimeMs = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs += ((js.jobId, System.nanoTime(),
            Option(js.properties.getProperty("spark.job.description"))
              .getOrElse("")))
          js.stageIds.foreach(sid => stageToJob(sid) = js.jobId)
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_._1 == je.jobId).foreach { case (id, t0, d) =>
            jobWall += ((id, (System.nanoTime() - t0) / 1e9, d))
          }
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        jobs.synchronized { stages += 1 }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          tasks += 1
          if (te.taskInfo != null) {
            taskTimeMs += te.taskInfo.duration
            stageToJob.get(te.stageId).foreach { j =>
              jobTaskMs(j) += te.taskInfo.duration
              jobTasks(j) += 1
            }
          }
        }
    }

    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      // warmup (also builds the disk-cached engine tables on first use)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      jobs.clear(); jobWall.clear(); stages = 0; tasks = 0L; taskTimeMs = 0L
      stageToJob.clear(); jobTaskMs.clear(); jobTasks.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"== $name: wall=$wall%.3f s, jobs=${jobWall.size}, " +
        f"stages=$stages, tasks=$tasks, taskTime=${taskTimeMs / 1000.0}%.2f s")
      jobWall.sortBy(-_._2).take(40).foreach { case (id, w, d) =>
        println(f"   job#$id%-4d $w%7.3f s  tasks=${jobTasks(id)}%-3d " +
          f"taskTime=${jobTaskMs(id) / 1000.0}%6.2f s  ${d.take(90)}")
      }
    }
    spark.stop()
  }
}
