package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Dev probe (round-17, uncommitted-quality tool): decompose one streaming
  * replay's wall into start / per-batch durationMs phases / stop, via the
  * StreamingQueryProgress the engine already records. Usage:
  *   sbt "runMain graft.streaming.StreamProbe <sfDir> [reps]"
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val s = graft.Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.core.Tables(s, sfDir, "events").count()

    (1 to reps).foreach { rep =>
      val ckpt = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "probe_ckpt")
      val streamDir = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get("/dev/shm"), "probe_src")
      java.nio.file.Files.createSymbolicLink(
        streamDir.resolve("events.parquet"),
        java.nio.file.Paths.get(s"$sfDir/events.parquet"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.shuffle.partitions",
        sys.env.getOrElse("PROBE_PARTS", "1"))
      s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      val schema = s.read.parquet(s"$sfDir/events.parquet").schema
      val t0 = System.nanoTime()
      val st = s.readStream.schema(schema).parquet(streamDir.toString)
      val agg = st
        .withColumn("ts", graft.core.Tables.normTs(st, "ts"))
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val tBuild = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val q = agg.writeStream.format("memory").queryName(s"probe_$rep")
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      val tStart = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      q.awaitTermination()
      val tAwait = (System.nanoTime() - t2) / 1e9
      println(f"rep $rep build=$tBuild%.3f start=$tStart%.3f await=$tAwait%.3f")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"  batch ${p.batchId}: " + d.entrySet().toArray.mkString(" "))
      }
      StreamOps.rmTree(ckpt); StreamOps.rmTree(streamDir)
    }
    s.stop()
  }
}
