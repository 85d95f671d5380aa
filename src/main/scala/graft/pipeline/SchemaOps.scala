package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Exact => E, Q, Tables => T}

/** Schema lifecycle at the ingest boundary — the two events every
  * long-lived lake hits within a quarter:
  *
  *   EVOLUTION (x_schema_evolution): a new column starts shipping and
  *   the silver store now holds file generations with DIFFERENT parquet
  *   schemas. Spark's per-file schema merge (`mergeSchema`) is the
  *   reader capability that makes the old files readable forever — old
  *   rows surface the new column as null, no rewrite of history.
  *
  *   DRIFT (x_schema_drift): an UNEXPECTED field appears in the raw
  *   JSON. The schema-pinned production read (SURVEY.md §2a R3)
  *   deliberately ignores it — correct for availability, silent as an
  *   operational signal. The drift gate re-scans the raw text with a
  *   JSON path probe and counts rows carrying fields the pinned schema
  *   doesn't know, so the "upstream started sending something new"
  *   alarm fires before a quarter of data has shipped without it.
  *
  * Both fixtures are planted with key-modulus rules, so the oracle
  * prices every count arithmetically from the orders table.
  */
object SchemaOps {

  /** X — parquet schema evolution across file generations: generation 1
    * (even keys) lacks `priority`; generation 2 (odd keys) carries it.
    * One mergeSchema read serves both: old rows surface priority as
    * null, new rows keep theirs, and the exact decimal total proves no
    * row was lost or doubled crossing the schema boundary. The
    * has_priority_column fact pins the merged schema itself.
    *
    * Scale posture: mergeSchema's cost is a footer read per distinct
    * schema at planning time (Spark samples footers in parallel); the
    * data path is unchanged. A 100 TB deployment bounds the distinct
    * schema count by compacting old generations forward, not by
    * rewriting history on day one of a new column.
    */
  val xSchemaEvolution = Q(
    "x_schema_evolution",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(*) FILTER (WHERE o_orderkey % 2 = 0) AS BIGINT) AS n_old_schema,
              CAST(count(*) FILTER (WHERE o_orderkey % 2 = 1) AS BIGINT) AS n_with_priority,
              CAST(count(DISTINCT o_orderpriority)
                   FILTER (WHERE o_orderkey % 2 = 1) AS BIGINT) AS n_priorities,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
              TRUE AS has_priority_column
       FROM orders""") { (s, dir) =>
    val orders = T(s, dir, "orders")
    val store = graft.ops.Extra.scratch(s, "schemaevo/silver")
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$store/gen=1")
    orders.filter(col("o_orderkey") % 2 === 1)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority").as("priority"))
      .write.mode("overwrite").parquet(s"$store/gen=2")
    val merged = s.read.option("mergeSchema", "true").parquet(store)
    merged.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("priority").isNull, 1L).otherwise(0L)).as("n_old_schema"),
      sum(when(col("priority").isNotNull, 1L).otherwise(0L)).as("n_with_priority"),
      countDistinct(col("priority")).as("n_priorities"),
      E.sumd(col("o_totalprice")).as("total"))
      .withColumn("has_priority_column",
        lit(merged.columns.contains("priority")))
  }

  /** X — schema-drift gate over the raw JSON: every key ≡ 0 (mod 53)
    * line carries an extra `new_field` the pinned schema doesn't know.
    * The production read must NOT break or drop those rows (extra
    * fields are valid JSON — `pinned_reads_all` grades that), and the
    * gate must count them exactly (`get_json_object` path probe over
    * the raw text — one extra narrow scan, codegen'd, only run by the
    * monitoring job).
    */
  val xSchemaDrift = Q(
    "x_schema_drift",
    """SELECT CAST(count(*) AS BIGINT) AS n_rows,
              CAST(count(*) FILTER (WHERE o_orderkey % 53 = 0) AS BIGINT) AS n_drifted,
              (1000000 * count(*) FILTER (WHERE o_orderkey % 53 = 0)) // count(*)
                AS drift_ppm,
              TRUE AS pinned_reads_all
       FROM orders""") { (s, dir) =>
    val orders = T(s, dir, "orders")
    val raw = graft.ops.Extra.scratch(s, "schemadrift/raw")
    val base = ParseAudit.jsonLines(orders, corrupt = false)
    // inject the unexpected field before the closing brace
    base.select(
        when(expr("get_json_object(value, '$.id')").cast("long") % 53 === 0,
          concat(expr("substring(value, 1, length(value) - 1)"),
            lit(",\"new_field\":\"surprise\"}")))
          .otherwise(col("value")).as("value"))
      .write.mode("overwrite").text(raw)

    // production read: pinned schema, drifted rows must all survive
    val pinned = s.read.schema(GhArchive.rawSchema)
      .option("mode", "DROPMALFORMED").json(raw)
    val nPinned = pinned.count()

    // the drift gate: raw-text path probe for fields outside the schema
    val gate = s.read.text(raw)
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(expr("get_json_object(value, '$.new_field')").isNotNull,
          1L).otherwise(0L)).as("n_drifted"))
    gate.select(
      col("n_rows"), col("n_drifted"),
      expr("(1000000 * n_drifted) div n_rows").as("drift_ppm"),
      (col("n_rows") === lit(nPinned)).as("pinned_reads_all"))
  }

  val all: Seq[Q] = Seq(xSchemaEvolution, xSchemaDrift)
}
