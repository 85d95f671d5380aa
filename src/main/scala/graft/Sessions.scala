package graft

import org.apache.spark.sql.SparkSession

/** Session factory: UTC-pinned, AQE on, shuffle partitions sized for the
  * local core count instead of the 200 default (the one local-mode knob
  * that matters; on a real cluster this comes from the submitter).
  */
object Sessions {
  def local(cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
