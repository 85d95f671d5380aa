package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}
import graft.core.{Q, Tables => T}

/** Parse-health accounting for the error-tolerant JSON ingest (SURVEY.md
  * §2a R3). The silver path maps the reference's `ignore_errors = true`
  * (/root/reference/data_lake_transformer.py:81-82) to DROPMALFORMED —
  * malformed rows VANISH silently, which is the right read semantics and
  * the wrong operational posture: a production ingest gate wants the
  * dropped count (the parse-health analog of x_psi_drift) before a bad
  * upstream deploy silently halves a day's data.
  *
  * The PERMISSIVE + `_corrupt_record` twin (SURVEY.md §1.3) reads the
  * SAME files keeping one row per malformed line with the raw text in
  * the corrupt column, so clean rows and the drop count come out of one
  * scan. The graded query builds a fixture with PLANTED corruption —
  * JSON lines derived from the orders table, truncated mid-object for
  * every key ≡ 0 (mod 37) — so the oracle can price every number
  * arithmetically from the source table without parsing any JSON:
  * n_clean / n_corrupt / the clean-row id sum are all key-modulus
  * facts, and `drop_matches` asserts in-query that the DROPMALFORMED
  * arm's rows are EXACTLY the PERMISSIVE arm's clean rows (count and id
  * sum), tying the audit back to the production read path. `clean_ppm`
  * is the dataset-card line: parse retention in parts per million.
  *
  * Scale posture: both arms are one pass over the text files, all
  * aggregation partial; the fixture write is one narrow projection of
  * orders. A truncated prefix of a JSON object can never re-parse as
  * valid (the closing brace is lost), so the planted corruption is
  * deterministic on both sides.
  */
object ParseAudit {

  /** JSON lines in the GhArchive raw shape derived from orders; every
    * key ≡ 0 (mod 37) line is truncated to half length (malformed).
    */
  private[pipeline] def jsonLines(orders: DataFrame): DataFrame = {
    val line = to_json(struct(
      col("o_orderkey").as("id"),
      struct(
        col("o_custkey").as("id"),
        concat(lit("u"), col("o_custkey")).as("login"),
        concat(lit("U"), col("o_custkey")).as("display_login")).as("actor"),
      col("o_orderstatus").as("type"),
      struct(
        (col("o_orderkey") % 1000).as("id"),
        concat(lit("repo/"), col("o_orderkey") % 1000).as("name"),
        concat(lit("https://example.test/"), col("o_orderkey") % 1000).as("url")).as("repo"),
      date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("created_at")))
    orders.select(
      when(col("o_orderkey") % 37 === 0,
        substring(line, 1, 40)) // cuts inside the actor struct: never valid
        .otherwise(line).as("value"))
  }

  val xMalformedAudit = Q(
    "x_malformed_audit",
    """SELECT CAST(count(*) FILTER (WHERE o_orderkey % 37 <> 0) AS BIGINT) AS n_clean,
              CAST(count(*) FILTER (WHERE o_orderkey % 37 = 0) AS BIGINT) AS n_corrupt,
              CAST(sum(o_orderkey) FILTER (WHERE o_orderkey % 37 <> 0) AS BIGINT) AS sum_clean_ids,
              (1000000 * count(*) FILTER (WHERE o_orderkey % 37 <> 0)) // count(*) AS clean_ppm,
              TRUE AS drop_matches
       FROM orders""") { (s, dir) =>
    val orders = T(s, dir, "orders")
    val out = graft.ops.Extra.scratch(s, "parseaudit/raw")
    jsonLines(orders).write.mode("overwrite").text(out)

    // production arm: the silver path's semantics (rows vanish)
    val dropped = s.read.schema(GhArchive.rawSchema)
      .option("mode", "DROPMALFORMED").json(out)
    val dropAgg = dropped.agg(
      count(lit(1)).as("d_n"), sum(col("id")).as("d_sum"))

    // audit arm: same files, malformed lines kept as _corrupt_record rows.
    // cache() first: Spark disallows queries that filter ONLY on the
    // internal corrupt column of a raw JSON scan (it would need a second
    // parse); the materialized plan lifts the restriction.
    val permSchema = StructType(
      GhArchive.rawSchema.fields :+
        org.apache.spark.sql.types.StructField("_corrupt_record", StringType))
    val perm = s.read.schema(permSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(out)
      .cache()
    perm.agg(
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L)).as("n_clean"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L)).as("n_corrupt"),
        sum(when(col("_corrupt_record").isNull, col("id"))).as("sum_clean_ids"),
        count(lit(1)).as("n_total"))
      .crossJoin(broadcast(dropAgg))
      .select(
        col("n_clean"), col("n_corrupt"), col("sum_clean_ids"),
        expr("(1000000 * n_clean) div n_total").as("clean_ppm"),
        (col("n_clean") === col("d_n") &&
          col("sum_clean_ids") === col("d_sum")).as("drop_matches"))
  }

  val all: Seq[Q] = Seq(xMalformedAudit)
}
