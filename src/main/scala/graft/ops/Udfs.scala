package graft.ops

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}

/** User-defined function surface (SURVEY.md §2b Q31): scalar UDF, typed
  * Aggregator UDAF, and a flatMap generator (UDTF-equivalent). The oracle
  * expresses the same logic as plain SQL.
  *
  * Note the preference order from §4: these exist to prove the extension
  * surface; equivalent built-ins (codegen'd) are used everywhere else.
  */
object Udfs {

  /** Q31a — scalar UDF: vowel count. */
  val q31a = Q(
    "q31_udf_scalar",
    """SELECT p_partkey,
       CAST(length(p_name) - length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS BIGINT) AS n_vowels
       FROM part ORDER BY p_partkey""") { (s, dir) =>
    val vowels = udf((name: String) => name.count("aeiou".contains(_)).toLong)
    T(s, dir, "part")
      .select(col("p_partkey"), vowels(col("p_name")).as("n_vowels"))
      .orderBy("p_partkey")
  }

  /** Geometric mean as a typed Aggregator (sum of logs, exact count). */
  object GeoMean extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), x: Double): (Double, Long) =
      (b._1 + math.log(x), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double =
      if (b._2 == 0) 0.0 else math.exp(b._1 / b._2)
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Q31b — UDAF: geometric mean of l_quantity per return flag. Rounded
    * to 6 digits on both sides (float sum order differs across engines;
    * the log-sum's relative error is ~1e-13, far inside the rounding
    * margin).
    */
  val q31b = Q(
    "q31_udaf_geomean",
    """SELECT l_returnflag, round(exp(avg(ln(l_quantity))), 6) AS geo_qty
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, dir) =>
    val geo = udaf(GeoMean)
    T(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(geo(col("l_quantity")), 6).as("geo_qty"))
      .orderBy("l_returnflag")
  }

  /** Q31c — UDTF-equivalent: typed flatMap generating one row per token
    * (documents 0–4).
    */
  val q31c = Q(
    "q31_udtf_words",
    """SELECT doc_id, unnest(string_split(text, ' ')) AS word
       FROM documents WHERE doc_id < 5 ORDER BY doc_id, word""") { (s, dir) =>
    import s.implicits._
    T(s, dir, "documents")
      .filter(col("doc_id") < 5)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) => text.split(" ").map(w => (id, w)) }
      .toDF("doc_id", "word")
      .orderBy("doc_id", "word")
  }

  val all: Seq[Q] = Seq(q31a, q31b, q31c)
}
