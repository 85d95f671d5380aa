package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Throwaway diagnostic for x_stream_late (run via Test/runMain). */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val s = graft.SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    val ev = graft.core.Tables(s, dir, "events")
      .select(col("event_id"), col("ts"), col("event_type"))
    val lateC = col("ts") < lit("2024-01-10").cast("timestamp") &&
      col("event_id") % 7 === 0
    val stage = java.nio.file.Files.createTempDirectory("lateprobe")
    def stageOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"lp_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath, stage.resolve(s"$name.parquet"))
      ()
    }
    stageOne(ev.filter(!lateC), "ontime")
    val sch = s.read.parquet(stage.toString).schema
    val ckpt = java.nio.file.Files.createTempDirectory("lateprobe_ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("lateprobe_out").toString + "/e"
    def runOnce(tag: String): Unit = {
      val st = s.readStream.schema(sch).parquet(stage.toString)
      val agg = st.withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      val q = agg.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          println(s"[$tag] batch $id emitted ${b.count()} rows")
        }
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q.recentProgress.foreach { p =>
        println(s"[$tag] progress batch=${p.batchId} rows=${p.numInputRows} " +
          s"wm=${p.eventTime.get("watermark")} " +
          s"dropped=${p.stateOperators.map(_.numRowsDroppedByWatermark).sum}")
      }
    }
    runOnce("run1")
    stageOne(ev.filter(lateC), "late")
    runOnce("run2")
  }
}
