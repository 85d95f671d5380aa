package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Dev tool (round-16 optimization): per-JOB wall-clock attribution for a
  * query build. Every eager action inside a composite build (localCheckpoint,
  * store write, driver count, the final count) is a separate Spark job; a
  * listener keyed on the job's call site maps each job's wall to the code
  * line that launched it. Usage:
  *
  *   sbt "runMain graft.Profile <sfDir> <name> [<name> ...]"
  *
  * Each query runs twice; both runs are broken down (run 1 shows cold
  * first-execution costs the bench's min-of-reps hides, run 2 is the
  * warm rep the bench actually scores).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = args.drop(1).toSeq
    val spark = Sessions.local()
    // warm the session the way the bench does
    graft.core.Tables.names.foreach { t =>
      try graft.core.Tables(spark, sfDir, t).count()
      catch { case scala.util.control.NonFatal(_) => }
    }

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val done = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = Option(js.properties.getProperty("callSite.short"))
          .orElse(js.stageInfos.lastOption.map(_.name))
          .getOrElse("?")
        jobs.put(js.jobId, (site, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (site, t0) =>
          done.synchronized { done += site -> ((je.time - t0) / 1e3); () }
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(0L)
        if (ms > 300) done.synchronized {
          val tm = si.taskMetrics
          val run = if (tm == null) -1L else tm.executorRunTime
          val cpu = if (tm == null) -1L else tm.executorCpuTime / 1000000
          val deser = if (tm == null) -1L else tm.executorDeserializeTime
          done += s"    [stage ${si.stageId} ${si.numTasks}t wall=${ms / 1e3}s run=${run / 1e3}s cpu=${cpu / 1e3}s deser=${deser / 1e3}s] ${si.name.take(70)}" -> 0.0
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { rep =>
        done.synchronized(done.clear())
        // decompose the per-query driver floor (round-17 verdict ask 1):
        // build (plan construction) / plan (analysis+optimization+physical
        // planning, from the QueryPlanningTracker) / execute (jobs + AQE
        // re-optimization + scheduling, where gap = wall − jobSum)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val cnt = df.groupBy().count()
        cnt.queryExecution.executedPlan // force analysis/opt/planning
        val tPlan = (System.nanoTime() - t1) / 1e9
        val phases = cnt.queryExecution.tracker.phases
          .map { case (p, s) => s"$p=${(s.endTimeMs - s.startTimeMs)}ms" }
          .mkString(" ")
        val t2 = System.nanoTime()
        cnt.collect()
        val tExec = (System.nanoTime() - t2) / 1e9
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let the async listener bus drain
        val lines = done.synchronized(done.toSeq)
        val jobSum = lines.map(_._2).sum
        println(f"\n== $name rep $rep wall=$wall%.3f s (build=$tBuild%.3f plan=$tPlan%.3f exec=$tExec%.3f) jobs=${lines.count(_._2 > 0)} jobSum=$jobSum%.3f s execGap=${tExec - jobSum}%.3f s [$phases]")
        lines.zipWithIndex.foreach { case ((site, sec), i) =>
          println(f"  job$i%3d $sec%8.3f s  $site")
        }
      }
    }
    spark.stop()
  }
}
