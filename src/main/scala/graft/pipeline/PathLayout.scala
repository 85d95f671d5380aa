package graft.pipeline

import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Pure path/filename layout of the medallion lake, matching the reference
  * byte-for-byte (cited per function). Kept as pure string functions so
  * they are unit-testable 1:1 against the reference's own test cases
  * (/root/reference/tests/test_dl_transformer.py:76-97).
  */
object PathLayout {

  private val dayFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd")
  private val hourFmt = DateTimeFormatter.ofPattern("HH")

  /** GHArchive source URL — hour WITHOUT leading zero (`%-H`), a quirk the
    * sink side does not share (/root/reference/data_lake_ingester.py:26-30).
    */
  def sourceUrl(processDate: LocalDateTime): String =
    s"http://data.gharchive.org/${processDate.format(dayFmt)}-${processDate.getHour}.json.gz"

  /** `YYYY-MM-DD` or `YYYY-MM-DD/HH` (zero-padded `%H`)
    * (/root/reference/data_lake_transformer.py:178-184).
    */
  def partitionPath(processDate: LocalDateTime, hasHourlyPartition: Boolean): String =
    if (hasHourlyPartition)
      s"${processDate.format(dayFmt)}/${processDate.format(hourFmt)}"
    else processDate.format(dayFmt)

  /** `{dataType}_{YYYYMMDD[_HH]}.{ext}`
    * (/root/reference/data_lake_transformer.py:186-192).
    */
  def exportFilename(
      dataType: String,
      processDate: LocalDateTime,
      hasHourlyPartition: Boolean,
      extension: String = "parquet"): String = {
    val ts =
      if (hasHourlyPartition)
        processDate.format(DateTimeFormatter.ofPattern("yyyyMMdd_HH"))
      else processDate.format(DateTimeFormatter.ofPattern("yyyyMMdd"))
    s"${dataType}_$ts.$extension"
  }

  /** Bronze ingest key `{base}/{YYYY-MM-DD}/{HH}/{file}`
    * (/root/reference/data_lake_ingester.py:102-113).
    */
  def ingestKey(basePath: String, processDate: LocalDateTime, fileName: String): String =
    s"$basePath/${partitionPath(processDate, hasHourlyPartition = true)}/$fileName"

  /** Hour glob over bronze: base/day/hour/ + trailing wildcard
    * (/root/reference/data_lake_transformer.py:166-170).
    */
  def rawHourlyGlob(root: String, basePath: String, processDate: LocalDateTime): String =
    s"$root/$basePath/${partitionPath(processDate, hasHourlyPartition = true)}/*"

  /** Day glob over silver: base/day/ + hour wildcard + "parquet" wildcard
    * (/root/reference/data_lake_transformer.py:172-176).
    */
  def silverDailyGlob(root: String, basePath: String, processDate: LocalDateTime): String =
    s"$root/$basePath/${partitionPath(processDate, hasHourlyPartition = false)}/*/*.parquet"

  /** Sink directory for one batch's output. The reference writes a single
    * file; we write a parquet directory of the same name — its own daily
    * glob is insensitive to the difference (documented deviation,
    * SURVEY.md §7).
    */
  def sinkPath(
      root: String,
      basePath: String,
      dataType: String,
      processDate: LocalDateTime,
      hasHourlyPartition: Boolean): String =
    s"$root/$basePath/${partitionPath(processDate, hasHourlyPartition)}/" +
      exportFilename(dataType, processDate, hasHourlyPartition)

  /** Basename extraction with compression double-extension handling
    * (/root/reference/data_lake_transformer.py:144-164).
    */
  def extractFilename(path: String, removeExtension: Boolean = false): String = {
    val noScheme = path.replace("s3://", "")
    val base = noScheme.substring(noScheme.lastIndexOf('/') + 1)
    if (!removeExtension) base
    else {
      val compressionExts = Set(".gz", ".bz2", ".zip", ".xz", ".zst")
      def splitExt(name: String): (String, String) = {
        val i = name.lastIndexOf('.')
        if (i <= 0) (name, "") else (name.substring(0, i), name.substring(i))
      }
      val (stem, ext) = splitExt(base)
      if (compressionExts.contains(ext.toLowerCase)) splitExt(stem)._1 else stem
    }
  }
}
