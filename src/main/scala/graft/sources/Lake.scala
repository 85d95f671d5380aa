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
    recoverHalfSwap(fs, path)
    val dataFiles = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (dataFiles.length <= targetFiles) return dataFiles.length.toLong
    val df = spark.read.parquet(path)
    val tmp = path + "__rewrite_tmp"
    df.coalesce(targetFiles).write.mode("overwrite").parquet(tmp)
    swapInto(fs, tmp, path)
    targetFiles.toLong
  }

  /** MERGE-by-key into a parquet dataset: rows of `updates` replace
    * same-key target rows; new keys append. One left-anti join + union +
    * swap rewrite — the parquet-lake spelling of MERGE INTO (a table
    * format with a commit log does the same thing with file-level
    * surgery; the join shape is identical).
    *
    * At scale the anti-join shuffles both sides on the key unless the
    * dataset was written with writeBucketed on that key (then both sides
    * co-locate, no exchange) or the updates set is broadcast-small.
    * Same crash discipline as compact(): recovery on entry, backup kept
    * until the swapped directory verifies.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverHalfSwap(fs, path)
    val target = spark.read.parquet(path)
    val merged = target
      .join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates.select(target.columns.map(col): _*))
    val tmp = path + "__rewrite_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    swapInto(fs, tmp, path)
  }

  /** Roll back a half-completed swap left by a crash between the two
    * renames: source missing, data stranded in the __rewrite_old backup.
    */
  private def recoverHalfSwap(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val bak = new org.apache.hadoop.fs.Path(path + "__rewrite_old")
    if (!fs.exists(hPath) && fs.exists(bak)) fs.rename(bak, hPath)
  }

  /** Verified directory swap: tmp must carry _SUCCESS; the old directory
    * is kept as __rewrite_old until the new one verifies, then dropped.
    * See compact()'s scaladoc for the honest crash-window statement.
    */
  private def swapInto(fs: org.apache.hadoop.fs.FileSystem,
      tmpDir: String, path: String): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(tmpDir)
    val bak = new org.apache.hadoop.fs.Path(path + "__rewrite_old")
    if (!fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")))
      throw new IllegalStateException(s"swap: $tmp missing _SUCCESS; aborting")
    if (fs.exists(bak)) fs.delete(bak, true)
    fs.rename(hPath, bak)
    fs.rename(tmp, hPath)
    // only drop the backup once the new directory is verifiably in place
    if (fs.exists(new org.apache.hadoop.fs.Path(hPath, "_SUCCESS"))) fs.delete(bak, true)
    else { fs.delete(hPath, true); fs.rename(bak, hPath)
      throw new IllegalStateException(s"swap verification failed for $path; rolled back") }
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
