package graft.claims

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The single-writer contract made loud: a second concurrent upload
  * flow against one mart fails cleanly BEFORE touching any state.
  */
class MaintenanceLeaseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def fs = new Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def fixture = ClaimsEtl.ingestCsv(spark,
    getClass.getResource("/claims_fixture.csv").getPath)

  test("a second interleaved flow fails cleanly pre-upsert") {
    val base = java.nio.file.Files.createTempDirectory("lease1").toString
    val hubPath = s"$base/hub"
    val martDir = s"$base/mart"
    // Writer A is mid-flow: it holds a live lease.
    MaintenanceLease.acquire(fs, new Path(martDir), "writer-a",
      MaintenanceLease.defaultTtlMs)
    // Writer B's whole flow must fail up front...
    val e = intercept[IllegalStateException] {
      UploadFlow.run(spark, fixture, hubPath, martDir, "2024-02-01")
    }
    assert(e.getMessage.contains("lease"))
    // ...with NOTHING half-done: no hub, no mart data, no journals.
    assert(!new java.io.File(hubPath).exists,
      "the blocked flow must not have touched the hub")
    assert(!new java.io.File(martDir).listFiles()
      .exists(f => !f.getName.startsWith("_") && !f.getName.startsWith(".")),
      "the blocked flow must not have written mart data")
    assert(!new java.io.File(SeriesCounts.dirFor(martDir)).exists,
      "the blocked flow must not have journaled count partitions")
    // Writer A finishes and releases → B's retry succeeds.
    MaintenanceLease.release(fs, new Path(martDir), "writer-a")
    assert(!UploadFlow.run(spark, fixture, hubPath, martDir, "2024-02-01"))
    assert(new java.io.File(martDir).listFiles()
      .exists(_.getName.startsWith("key_bucket=")))
  }

  test("a crashed holder's stale lease is taken over after the TTL") {
    val base = java.nio.file.Files.createTempDirectory("lease2").toString
    val martDir = s"$base/mart"
    // A holder that died 1h ago (no release) must not block forever.
    val root = new Path(martDir)
    fs.mkdirs(root)
    val out = fs.create(new Path(root, MaintenanceLease.leaseFile), false)
    out.write((s"epoch=${System.currentTimeMillis() - 3600 * 1000}\n" +
      "owner=dead-writer\n").getBytes("UTF-8"))
    out.close()
    assert(!UploadFlow.run(spark, fixture, s"$base/hub", martDir,
      "2024-02-01"), "the takeover flow runs to completion")
    assert(!new java.io.File(martDir, MaintenanceLease.leaseFile).exists,
      "the completed flow releases its own (taken-over) lease")
  }

  test("withLease releases on failure; release ignores a foreign lease") {
    val base = java.nio.file.Files.createTempDirectory("lease3").toString
    val root = new Path(s"$base/mart")
    intercept[RuntimeException] {
      MaintenanceLease.withLease(spark, root.toString) {
        throw new RuntimeException("body failed")
      }
    }
    assert(!fs.exists(new Path(root, MaintenanceLease.leaseFile)),
      "a failing body must still release the lease")
    // A release by a writer that LOST its lease to takeover must not
    // delete the new holder's marker.
    MaintenanceLease.acquire(fs, root, "new-holder",
      MaintenanceLease.defaultTtlMs)
    MaintenanceLease.release(fs, root, "old-holder")
    assert(fs.exists(new Path(root, MaintenanceLease.leaseFile)),
      "a foreign release must not delete the live holder's lease")
    MaintenanceLease.release(fs, root, "new-holder")
  }
}
