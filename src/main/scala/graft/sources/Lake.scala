package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    * (source→`__rewrite_old`, tmp→source) and HDFS/posix renames are each
    * atomic but the PAIR is not — a crash between them leaves the source
    * path missing with the data intact in `__rewrite_old`. That window is
    * closed two ways: (a) on entry compact() detects the half-swapped
    * state and rolls `__rewrite_old` back before doing anything else, and
    * (b) `__rewrite_old` is only deleted after the new source directory is
    * verified present with a `_SUCCESS` marker, so data always exists at
    * one of the two paths. Concurrent readers during the swap can still
    * observe a transiently missing directory — callers that need
    * always-readable maintenance should put the dataset behind the
    * version-directory indirection below (`writeVersioned` /
    * `readCurrent` / `compactVersioned`), where readers never resolve a
    * missing path; this in-place helper targets single-writer batch
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
      .unionByName(updates.select(target.columns.toSeq.map(col): _*))
    val tmp = path + "__rewrite_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    swapInto(fs, tmp, path)
  }

  /** MERGE-by-key keeping the NEWEST row per key across target ∪ updates,
    * "newest" = max of `orderCols` (callers include a unique tiebreak).
    * Unlike upsert(), which lets updates replace target rows
    * unconditionally, this is safe under out-of-order and DUPLICATE
    * delivery — applying the same batch twice, or a late batch carrying
    * older versions, changes nothing. That idempotence is what makes it
    * the right sink for streaming CDC apply (see x_stream_upsert): Spark's
    * foreachBatch re-delivers a batch after a crash, and the merge
    * absorbs the replay. One window over target ∪ updates, shuffled on
    * the key — co-locates for free if the dataset is bucketed on it.
    */
  def upsertLatest(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String], orderCols: Seq[Column]): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverHalfSwap(fs, path)
    if (!fs.exists(new org.apache.hadoop.fs.Path(path))) {
      updates.limit(0).write.mode("overwrite").parquet(path) // seed schema
    }
    val target = spark.read.parquet(path)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(_.desc): _*)
    val merged = target
      .unionByName(updates.select(target.columns.toSeq.map(col): _*))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val tmp = path + "__rewrite_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    swapInto(fs, tmp, path)
  }

  /** Roll back a half-completed swap left by a crash between the two
    * renames: source missing, data stranded in the __rewrite_old backup
    * (or the pre-round-3 __compact_old spelling — still recovered for one
    * release so an old crash's backup isn't orphaned).
    */
  private def recoverHalfSwap(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(hPath)) Seq("__rewrite_old", "__compact_old")
      .map(s => new org.apache.hadoop.fs.Path(path + s))
      .find(fs.exists)
      .foreach(bak => renameOrThrow(fs, bak, hPath))
  }

  /** rename() reports failure by RETURNING false on most Hadoop
    * FileSystems (it only throws for a few error classes) — an unchecked
    * rename can silently no-op the whole swap. Centralize the check.
    */
  private def renameOrThrow(fs: org.apache.hadoop.fs.FileSystem,
      src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Unit =
    if (!fs.rename(src, dst))
      throw new IllegalStateException(s"rename $src -> $dst failed")

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
    renameOrThrow(fs, hPath, bak)
    renameOrThrow(fs, tmp, hPath)
    // only drop the backup once the new directory is verifiably in place
    if (fs.exists(new org.apache.hadoop.fs.Path(hPath, "_SUCCESS"))) fs.delete(bak, true)
    else { fs.delete(hPath, true); renameOrThrow(fs, bak, hPath)
      throw new IllegalStateException(s"swap verification failed for $path; rolled back") }
  }

  // ---- version-directory indirection: concurrent-reader-safe rewrites ----

  private def versionDirs(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[(Long, org.apache.hadoop.fs.Path)] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      // tolerate stray non-numeric "v=..." dirs (user/tool litter): they
      // are not versions, and a parse crash here would take down every
      // read of an otherwise healthy dataset
      .flatMap(s => s.getPath.getName.stripPrefix("v=").toLongOption
        .map(_ -> s.getPath))
      .sortBy(_._1)

  /** Highest committed version dir (`v=<n>` carrying `_SUCCESS`), if any.
    * A version becomes visible exactly when Spark's committer drops
    * `_SUCCESS` — the single atomic publication point — so readers never
    * resolve a missing or partially-written directory, closing the
    * transient-miss window the in-place swap has. This is the minimal
    * manifest-style indirection of a table format: the "commit log" is
    * the version numbering + _SUCCESS marker.
    */
  def currentVersion(spark: SparkSession, path: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    versionDirs(fs, root)
      .filter { case (_, p) =>
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) }
      .lastOption.map(_._2.toString)
  }

  /** Publish `df` as the next version of the dataset at `path`. Older
    * versions are retired, EXCEPT the latest previously-COMMITTED one,
    * which is kept one extra generation as a grace window for scans that
    * resolved it before this commit. The grace test is on committedness,
    * not raw version number: a dead writer's uncommitted v=N must never
    * displace the committed version in-flight readers are actually
    * scanning (its number is still consumed, so the dead dir is simply
    * deleted).
    */
  def writeVersioned(df: DataFrame, path: String): Long = {
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing = versionDirs(fs, root)
    val next = existing.lastOption.map(_._1 + 1).getOrElse(0L)
    df.write.mode("overwrite").parquet(s"$path/v=$next")
    val grace = existing
      .filter { case (_, p) =>
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) }
      .lastOption.map(_._1)
    // retention keep-set: versions pinned as fork bases by live branches
    // (Branching.fork writes branches/<name>/_base) survive every
    // publish until the branch is deleted — the Iceberg rule that a
    // branch ref protects its snapshot from expiry. Without this, a
    // commit-less fork's read breaks as soon as main advances two
    // generations (the pin pointed at a retired directory).
    val pinned = pinnedBases(fs, root)
    existing.foreach { case (v, p) =>
      if (!grace.contains(v) && !pinned.contains(v)) fs.delete(p, true)
    }
    next
  }

  /** Fork-base versions pinned by branch markers under
    * `path/branches/<branch>/_base` — the keep-set retention consults so
    * a branch's base snapshot stays readable while the branch lives.
    * A marker that cannot be read or parsed pins nothing (corrupt
    * litter must not block every future publish), but a HEALTHY marker
    * always pins: fail-open only on the marker, never on the version.
    */
  private[sources] def pinnedBases(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Set[Long] = {
    val br = new org.apache.hadoop.fs.Path(root, "branches")
    if (!fs.exists(br)) Set.empty
    else fs.listStatus(br).toSeq.filter(_.isDirectory).flatMap { d =>
      val m = new org.apache.hadoop.fs.Path(d.getPath, "_base")
      try {
        if (!fs.exists(m)) None
        else {
          val in = fs.open(m)
          try scala.io.Source.fromInputStream(in, "UTF-8")
            .mkString.trim.toLongOption
          finally in.close()
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }.toSet
  }

  /** Read the current committed version (fails if none committed yet). */
  def readCurrent(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(currentVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed version under $path")))

  /** Committed version numbers still on disk, oldest first (the current
    * one plus the one-generation grace window writeVersioned keeps).
    */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    versionDirs(fs, root)
      .filter { case (_, p) =>
        fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) }
      .map(_._1)
  }

  /** Time-travel read of a specific committed version. Retention here is
    * one grace generation (writeVersioned retires older dirs), so this
    * serves "compare against the previous publish" — x_dataset_diff's
    * input shape — not unbounded history; a table format's log extends
    * the same mechanism indefinitely.
    */
  def readVersion(spark: SparkSession, path: String, version: Long): DataFrame = {
    val candidates = versions(spark, path)
    if (!candidates.contains(version))
      throw new IllegalStateException(
        s"version $version not on disk under $path (have: " +
          s"${candidates.mkString(", ")})")
    spark.read.parquet(s"$path/v=$version")
  }

  /** compact(), but behind the version indirection: rewrites the current
    * version's files into ~targetBytes outputs as version n+1; readers of
    * version n are undisturbed (its directory survives one generation).
    * Returns the file count of the current layout.
    */
  def compactVersioned(spark: SparkSession, path: String,
      targetBytes: Long = 256L << 20): Long = {
    val cur = currentVersion(spark, path).getOrElse(
      throw new IllegalStateException(s"no committed version under $path"))
    val curPath = new org.apache.hadoop.fs.Path(cur)
    val fs = curPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(curPath)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val targetFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (dataFiles.length <= targetFiles) return dataFiles.length.toLong
    writeVersioned(spark.read.parquet(cur).coalesce(targetFiles), path)
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

  /** Clustered write with PARQUET-NATIVE skipping structures beside the
    * homegrown manifests: per-column bloom filters (for point lookups on
    * high-cardinality NON-cluster columns, where row-group min/max stats
    * are useless because the cluster sort scattered the column) and
    * small row-count-limited pages so the format's page-level COLUMN
    * INDEX has real granularity on the sorted cluster column.
    *
    * Two deliberate writer flags per bloom column:
    *  - `parquet.bloom.filter.enabled#col` + `expected.ndv#col` — the
    *    filter itself, sized to the expected distinct count;
    *  - `parquet.enable.dictionary#col = false` — parquet-mr SKIPS
    *    writing a bloom filter for a fully dictionary-encoded chunk
    *    (the dictionary already gives exact membership), and this
    *    fixture's key column is small enough to dictionary-encode. At
    *    real scale a 10⁹-distinct key blows the 1 MB dictionary
    *    threshold and falls back to plain encoding ANYWAY — disabling
    *    the dictionary reproduces the regime bloom filters exist for.
    */
  def writeClusteredParquetNative(df: DataFrame, path: String,
      numFiles: Int, clusterCol: String, bloomCols: Seq[(String, Long)],
      pageRows: Int = 1000): Unit = {
    val base = df.repartitionByRange(numFiles, col(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite")
      .option("parquet.page.row.count.limit", pageRows.toString)
    bloomCols.foldLeft(base) { case (w, (c, ndv)) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv.toString)
        .option(s"parquet.enable.dictionary#$c", "false")
    }.parquet(path)
  }

  /** writeClustered + a per-file [lo, hi] manifest over the (numeric)
    * cluster key, written as `_manifest.json` INSIDE the dataset directory
    * (underscore-prefixed → invisible to Spark's file index, so plain
    * readers are unaffected). readPruned() then skips whole files whose
    * band can't intersect the predicate — directory-listing-level pruning
    * like a table format's file statistics, without the format. At write
    * scale the stats would be folded into the writer's task commit; here
    * they cost one narrow post-write scan of the key column.
    *
    * The single-column manifest is the 1-band case of the z-order
    * machinery below — one shared format, writer, and parser.
    */
  def writeClusteredWithManifest(df: DataFrame, path: String, numFiles: Int,
      clusterCol: String): Unit = {
    writeClustered(df, path, numFiles, clusterCol)
    writeStatsManifest(df.sparkSession, path, "_manifest.json", Seq(clusterCol))
  }

  /** Read only the files whose manifest band intersects [lo, hi], with the
    * residual filter applied on top (file stats prune whole files; the
    * filter still decides rows). Falls back to a full filtered scan when
    * no manifest exists. The residual filter compares in the column's
    * NATIVE type (fractional values keep exact-boundary semantics; the
    * manifest's long-space stats are floor/ceil-safe for pruning because
    * they only ever widen a file's band).
    */
  def readPruned(spark: SparkSession, path: String, clusterCol: String,
      lo: Long, hi: Long): DataFrame =
    prunedBase(spark, path, "_manifest.json", Seq(clusterCol -> (lo, hi)))
      .filter(col(clusterCol) >= lo && col(clusterCol) <= hi)

  /** (file, lo, hi) rows of a single-column stats manifest. */
  private[graft] def manifestEntries(fs: org.apache.hadoop.fs.FileSystem,
      mPath: org.apache.hadoop.fs.Path,
      clusterCol: String): Seq[(String, Long, Long)] = {
    val re = s"\"${java.util.regex.Pattern.quote(clusterCol)}\":\\[(-?\\d+),(-?\\d+)\\]".r
    manifestLines(fs, mPath).flatMap { line =>
      for {
        f <- fileOf(line)
        m <- re.findFirstMatchIn(line)
      } yield (f, m.group(1).toLong, m.group(2).toLong)
    }
  }

  /** Per-file [lo, hi] stats manifest over the given (long-castable)
    * columns: one JSON line per file, `{"file":"...","col":[lo,hi],...}`.
    * One narrow post-write scan, STREAMED through `toLocalIterator` — a
    * 100 TB table has 10⁵–10⁶ files, and collect()ing one row per file
    * would scale driver memory with the table; this holds one partition
    * of stats rows at a time and keeps driver memory flat.
    */
  private[graft] def writeStatsManifest(spark: SparkSession, path: String,
      manifestName: String, cols: Seq[String]): Unit = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).as(s"${c}__lo"),
      max(col(c).cast("long")).as(s"${c}__hi")))
    val stats = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .toLocalIterator()
    val mPath = new org.apache.hadoop.fs.Path(path, manifestName)
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(mPath, true)
    val w = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(out, "UTF-8"))
    try {
      while (stats.hasNext) {
        val r = stats.next()
        val f = r.getString(0).replace("\\", "\\\\").replace("\"", "\\\"")
        val bands = cols.zipWithIndex.map { case (c, i) =>
          // a file whose cluster column is all null has no band: publish
          // the full range so no predicate ever prunes it
          val (lo, hi) =
            if (r.isNullAt(1 + 2 * i) || r.isNullAt(2 + 2 * i))
              (Long.MinValue, Long.MaxValue)
            else (r.getLong(1 + 2 * i), r.getLong(2 + 2 * i))
          s""""$c":[$lo,$hi]"""
        }
        w.write(s"""{"file":"$f",${bands.mkString(",")}}""")
        w.write("\n")
      }
    } finally w.close()
  }

  private def manifestLines(fs: org.apache.hadoop.fs.FileSystem,
      mPath: org.apache.hadoop.fs.Path): Seq[String] = {
    val in = fs.open(mPath)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    text.linesIterator.filter(_.nonEmpty).toSeq
  }

  private def fileOf(line: String): Option[String] =
    "\"file\":\"(.*?)\"".r.findFirstMatchIn(line).map(m =>
      m.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))

  /** File-skipping only: the dataset restricted to files whose stats can
    * satisfy ALL the band predicates (no residual row filter — callers
    * decide the row-level comparison semantics). Falls back to the full
    * dataset when no manifest exists.
    */
  private def prunedBase(spark: SparkSession, path: String,
      manifestName: String, bands: Seq[(String, (Long, Long))]): DataFrame = {
    val mPath = new org.apache.hadoop.fs.Path(path, manifestName)
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(mPath)) spark.read.parquet(path)
    else {
      val keep = prunedFiles(fs, mPath, bands)
      if (keep.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(keep: _*)
    }
  }

  /** Shared band-pruned read in LONG space (stats space): file skipping +
    * cast-to-long residual filters, matching the manifest's semantics.
    */
  private[graft] def readBandPruned(spark: SparkSession, path: String,
      manifestName: String, bands: Seq[(String, (Long, Long))]): DataFrame =
    bands.foldLeft(prunedBase(spark, path, manifestName, bands)) {
      case (df, (c, (lo, hi))) =>
        df.filter(col(c).cast("long") >= lo && col(c).cast("long") <= hi)
    }

  /** Files whose per-file bands intersect EVERY `col -> [lo, hi]`
    * predicate (long space). A band column ABSENT from a manifest line
    * keeps the file (Option.forall): the manifest has no evidence to
    * prune on — a typo'd or non-clustered column degrades to a full
    * scan, never to silently-zero rows ("correctness over skips").
    */
  private[graft] def prunedFiles(fs: org.apache.hadoop.fs.FileSystem,
      mPath: org.apache.hadoop.fs.Path,
      bands: Seq[(String, (Long, Long))]): Seq[String] =
    manifestLines(fs, mPath).flatMap { line =>
      val ok = bands.forall { case (c, (lo, hi)) =>
        s"\"${java.util.regex.Pattern.quote(c)}\":\\[(-?\\d+),(-?\\d+)\\]".r
          .findFirstMatchIn(line)
          .forall(m => m.group(2).toLong >= lo && m.group(1).toLong <= hi)
      }
      if (ok) fileOf(line) else None
    }

  // ---- z-order clustering: multi-dimensional file skipping ----

  /** Bit-interleaved z-value of two columns, each linearly scaled to
    * [0, 2¹⁶) from the given bounds — the space-filling-curve sort key
    * for multi-dimensional clustering. Linear clustering gives the
    * LEADING column tight per-file bands and the trailing column none;
    * sorting by the z-curve gives every dimension locality, so selective
    * filters on either column (or both) skip most files.
    *
    * The mapping per dimension only needs to be monotone; linear min→max
    * scaling is right for roughly uniform domains (callers pass observed
    * bounds). For skewed domains substitute approx-quantile ranks — the
    * interleave is unchanged. Built from shift/and/or `functions` only,
    * so the whole key stays inside whole-stage codegen.
    */
  def zvalue2(a: Column, aLo: Long, aHi: Long,
      b: Column, bLo: Long, bHi: Long): Column = {
    def norm(c: Column, lo: Long, hi: Long): Column = {
      val span = math.max(1L, hi - lo)
      least(greatest((c.cast("long") - lit(lo)) * lit(65535L) / lit(span),
        lit(0L)), lit(65535L))
    }
    val x = norm(a, aLo, aHi)
    val y = norm(b, bLo, bHi)
    (0 until 16).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Write `df` z-order-clustered on two (numeric, long-castable) columns
    * with a per-file two-column [lo, hi] manifest (`_zmanifest.json`,
    * underscore-prefixed → invisible to plain readers). One narrow pass
    * computes the global bounds, one range-repartition+sort lays the
    * curve onto `numFiles` files, one narrow post-write scan collects the
    * per-file stats (a table format folds these into task commits).
    */
  def writeZOrdered(df: DataFrame, path: String, numFiles: Int,
      colA: String, colB: String): Unit = {
    val spark = df.sparkSession
    val bounds = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    // an empty input (or all-null cluster column) has no bounds to scale
    // into — write the plain layout with no manifest; readZPruned falls
    // back to a full filtered scan, so readers stay correct
    if ((0 to 3).exists(bounds.isNullAt)) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    val zv = zvalue2(col(colA), bounds.getLong(0), bounds.getLong(1),
      col(colB), bounds.getLong(2), bounds.getLong(3))
    df.withColumn("__zv", zv)
      .repartitionByRange(numFiles, col("__zv"))
      .sortWithinPartitions(col("__zv"))
      .drop("__zv")
      .write.mode("overwrite").parquet(path)
    writeStatsManifest(spark, path, "_zmanifest.json", Seq(colA, colB))
  }

  /** Files of a z-ordered dataset whose per-file bands intersect EVERY
    * given `col -> [lo, hi]` predicate band (long space). Exposed for
    * tests/audit; readZPruned is the query path.
    */
  private[graft] def zPrunedFiles(fs: org.apache.hadoop.fs.FileSystem,
      mPath: org.apache.hadoop.fs.Path,
      bands: Seq[(String, (Long, Long))]): Seq[String] =
    prunedFiles(fs, mPath, bands)

  /** Read a z-ordered dataset keeping only the files whose stats can
    * satisfy ALL the band predicates; the residual row filter still
    * applies on top. Falls back to a full filtered scan without a
    * manifest.
    */
  def readZPruned(spark: SparkSession, path: String,
      bands: Seq[(String, (Long, Long))]): DataFrame =
    readBandPruned(spark, path, "_zmanifest.json", bands)

  /** Hilbert-curve key of two columns scaled to [0, 2^bits) — the
    * zvalue2 companion (graft.functions.Hilbert has the curve walk and
    * the why). Same monotone linear scaling; only the space-filling
    * curve differs.
    */
  def hvalue2(a: Column, aLo: Long, aHi: Long,
      b: Column, bLo: Long, bHi: Long, bits: Int = 16): Column = {
    val top = (1L << bits) - 1
    def norm(c: Column, lo: Long, hi: Long): Column = {
      val span = math.max(1L, hi - lo)
      least(greatest((c.cast("long") - lit(lo)) * lit(top) / lit(span),
        lit(0L)), lit(top))
    }
    graft.functions.Hilbert.index2(norm(a, aLo, aHi), norm(b, bLo, bHi), bits)
  }

  /** Hilbert-clustered write — writeZOrdered with the curve swapped
    * (manifest `_hmanifest.json`); readHPruned is the query path.
    */
  def writeHilbertOrdered(df: DataFrame, path: String, numFiles: Int,
      colA: String, colB: String): Unit = {
    val spark = df.sparkSession
    val bounds = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    if ((0 to 3).exists(bounds.isNullAt)) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    val hv = hvalue2(col(colA), bounds.getLong(0), bounds.getLong(1),
      col(colB), bounds.getLong(2), bounds.getLong(3))
    df.withColumn("__hv", hv)
      .repartitionByRange(numFiles, col("__hv"))
      .sortWithinPartitions(col("__hv"))
      .drop("__hv")
      .write.mode("overwrite").parquet(path)
    writeStatsManifest(spark, path, "_hmanifest.json", Seq(colA, colB))
  }

  private[graft] def hPrunedFiles(fs: org.apache.hadoop.fs.FileSystem,
      mPath: org.apache.hadoop.fs.Path,
      bands: Seq[(String, (Long, Long))]): Seq[String] =
    prunedFiles(fs, mPath, bands)

  def readHPruned(spark: SparkSession, path: String,
      bands: Seq[(String, (Long, Long))]): DataFrame =
    readBandPruned(spark, path, "_hmanifest.json", bands)

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
