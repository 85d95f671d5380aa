package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source/sink utilities for the lake at scale.
  *
  * Three write disciplines, in increasing co-location strength:
  *   1. plain parquet (the medallion default; file-level parallelism)
  *   2. date-partitioned (`partitionBy`) — Catalyst partition-prunes
  *      time filters to directory listings, the idiomatic upgrade of the
  *      reference's glob-encoded date predicates (SURVEY.md §2a R12)
  *   3. bucketed tables (`bucketBy` + `sortBy`) — joins/aggregations on
  *      the bucket key need NO shuffle at read time; at 100 TB this is
  *      the difference between a full-network shuffle of the fact table
  *      per join and none.
  */
object Lake {

  /** Write with hive-style date partitions derived from a timestamp col.
    * Readers filtering on event_date get directory-level pruning.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write.mode("overwrite")
      .partitionBy("event_date")
      .parquet(path)

  /** Persist as a bucketed, per-bucket-sorted table. Subsequent equi-joins
    * or groupBys on `key` between tables bucketed the same way plan with
    * zero Exchange (verify with .explain — see LakeSpec).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a previous process may have left the managed location behind while
    // the (ephemeral) catalog forgot the table — clear it so overwrite
    // semantics hold across JVMs
    val warehouse = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(warehouse)) fs.delete(warehouse, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Compact a parquet directory's small files to ~`targetBytes` outputs.
    *
    * The small-files problem is THE operational failure mode of a
    * streaming/hourly lake at scale: every micro-batch or hourly job
    * leaves a few KB-MB files, and a year later a scan pays millions of
    * S3 GETs + footer reads. Compaction = one narrow rewrite:
    * target file count is derived from the directory's actual byte size,
    * coalesce (no shuffle) when shrinking file count, repartition only
    * when growing it.
    *
    * Crash semantics (honest): the swap is two directory renames
    * (source→`__compact_old`, tmp→source) and HDFS/posix renames are each
    * atomic but the PAIR is not — a crash between them leaves the source
    * path missing with the data intact in `__compact_old`. That window is
    * closed two ways: (a) on entry compact() detects the half-swapped
    * state and rolls `__compact_old` back before doing anything else, and
    * (b) `__compact_old` is only deleted after the new source directory is
    * verified present with a `_SUCCESS` marker, so data always exists at
    * one of the two paths. Concurrent readers during the swap can still
    * observe a transiently missing directory — callers that need
    * always-readable compaction should use a table format with a
    * transactional commit log; this helper targets single-writer batch
    * maintenance windows.
    */
  def compact(spark: SparkSession, path: String,
      targetBytes: Long = 256L << 20): Long = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = new org.apache.hadoop.fs.Path(path + "__compact_old")
    // recovery: a previous run crashed between the two swap renames
    if (!fs.exists(hPath) && fs.exists(bak)) fs.rename(bak, hPath)
    val dataFiles = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (dataFiles.length <= targetFiles) return dataFiles.length.toLong
    val df = spark.read.parquet(path)
    val tmp = new org.apache.hadoop.fs.Path(path + "__compact_tmp")
    df.coalesce(targetFiles).write.mode("overwrite").parquet(tmp.toString)
    if (!fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")))
      throw new IllegalStateException(s"compact: $tmp missing _SUCCESS; aborting swap")
    if (fs.exists(bak)) fs.delete(bak, true)
    fs.rename(hPath, bak)
    fs.rename(tmp, hPath)
    // only drop the backup once the new directory is verifiably in place
    if (fs.exists(new org.apache.hadoop.fs.Path(hPath, "_SUCCESS"))) fs.delete(bak, true)
    else { fs.delete(hPath, true); fs.rename(bak, hPath)
      throw new IllegalStateException(s"compact: swap verification failed for $path; rolled back") }
    targetFiles.toLong
  }

  /** Cluster-sort a dataset for scan-time pruning: range-repartition on
    * the given columns and sort within partitions before writing, so each
    * parquet file covers a narrow min/max band of the cluster keys and
    * row-group statistics prune selective filters to a handful of files.
    * (The practical flavor of Z-ordering for 1-2 correlated columns.)
    */
  def writeClustered(df: DataFrame, path: String, numFiles: Int,
      clusterCols: String*): Unit = {
    val cols = clusterCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Format round-trips (csv/json/orc share the same DataFrameReader/
    * Writer surface as parquet; schema must be supplied for the schemaless
    * text formats on read).
    */
  def writeAs(df: DataFrame, format: String, path: String): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  def readAs(spark: SparkSession, format: String, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame = {
    val r = spark.read.format(format)
    val r2 = schema.fold(r)(r.schema)
    (if (format == "csv") r2.option("header", "true") else r2).load(path)
  }
}
