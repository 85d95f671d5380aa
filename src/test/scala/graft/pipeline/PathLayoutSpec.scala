package graft.pipeline

import java.time.LocalDateTime
import org.scalatest.funsuite.AnyFunSuite

/** 1:1 port of the reference's pure-function tests
  * (/root/reference/tests/test_dl_transformer.py:76-97) plus the
  * source-vs-sink hour-padding quirk.
  */
class PathLayoutSpec extends AnyFunSuite {

  test("extractFilename: with extension, kept") {
    assert(PathLayout.extractFilename("s3://my-bucket/path/to/file.txt") == "file.txt")
  }

  test("extractFilename: with extension, removed") {
    assert(PathLayout.extractFilename("s3://my-bucket/path/to/file.txt", removeExtension = true) == "file")
  }

  test("extractFilename: no extension") {
    assert(PathLayout.extractFilename("s3://my-bucket/path/to/file") == "file")
    assert(PathLayout.extractFilename("s3://my-bucket/path/to/file", removeExtension = true) == "file")
  }

  test("extractFilename: multiple dots") {
    assert(PathLayout.extractFilename("s3://my-bucket/path/to/file.with.dots.txt") == "file.with.dots.txt")
    assert(PathLayout.extractFilename("s3://my-bucket/path/to/file.with.dots.txt", removeExtension = true) == "file.with.dots")
  }

  test("extractFilename: no s3:// prefix") {
    assert(PathLayout.extractFilename("my-bucket/path/to/file.txt") == "file.txt")
    assert(PathLayout.extractFilename("my-bucket/path/to/file.txt", removeExtension = true) == "file")
  }

  test("extractFilename: compression double extension") {
    assert(PathLayout.extractFilename("s3://b/2023-01-01-1.json.gz", removeExtension = true) == "2023-01-01-1")
  }

  test("source URL has unpadded hour; sink partition is zero-padded") {
    val d = LocalDateTime.of(2023, 1, 1, 7, 0)
    assert(PathLayout.sourceUrl(d) == "http://data.gharchive.org/2023-01-01-7.json.gz")
    assert(PathLayout.partitionPath(d, hasHourlyPartition = true) == "2023-01-01/07")
    assert(PathLayout.ingestKey("gharchive/events", d, "2023-01-01-7.json.gz") ==
      "gharchive/events/2023-01-01/07/2023-01-01-7.json.gz")
  }

  test("export filenames") {
    val d = LocalDateTime.of(2023, 1, 1, 7, 0)
    assert(PathLayout.exportFilename("clean", d, hasHourlyPartition = true) == "clean_20230101_07.parquet")
    assert(PathLayout.exportFilename("agg", d, hasHourlyPartition = false) == "agg_20230101.parquet")
  }

  test("globs") {
    val d = LocalDateTime.of(2023, 1, 1, 7, 0)
    assert(PathLayout.rawHourlyGlob("s3a://bronze", "gharchive/events", d) ==
      "s3a://bronze/gharchive/events/2023-01-01/07/*")
    assert(PathLayout.silverDailyGlob("s3a://silver", "gharchive/events", d) ==
      "s3a://silver/gharchive/events/2023-01-01/*/*.parquet")
  }
}
