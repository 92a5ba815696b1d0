package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The derived-table publish root must be configurable (spark conf
  * `spark.graft.publishRoot`): a driver-local tmpdir is per-node on a real
  * cluster, so the deploy points the gates' storage at a shared FS. This
  * spec runs the two publishing gates (q18 clustered layout, q54 WARC
  * framing) against a NON-DEFAULT root and checks both the results and
  * where the tables landed. */
class PublishRootSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"
  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft_publish_root").toFile.getAbsolutePath

  private lazy val spark = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[4]").appName("publish-root-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.graft.publishRoot", root)
      .config("spark.ui.enabled", "false").getOrCreate()
  }

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, dir).collect()

  test("q18 publishes its clustered table under the configured root") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val rows = run("q18_s2_pruned_scan")
    assert(rows.length == 1 && rows(0).getLong(0) > 0)
    val published = new java.io.File(root).listFiles()
      .filter(f => f.getName.startsWith("graft_q18_cluster_") && !f.getName.contains(".stage"))
    assert(published.length == 1, s"expected one published q18 dir under $root")
    assert(new java.io.File(published.head, "_SUCCESS").exists())
  }

  test("q54 publishes its WARC framing under the configured root and reuses it") {
    assume(new java.io.File(s"$dir/documents.parquet").exists())
    val rows = run("q54_warc_ingest")
    assert(rows.length == 1 && rows(0).getLong(0) > 0)
    val published = new java.io.File(root).listFiles()
      .filter(f => f.getName.startsWith("graft_q54_warc_") && !f.getName.contains(".stage"))
    assert(published.length == 1)
    val marker = new java.io.File(published.head, "_SUCCESS")
    assert(marker.exists())
    val mtime = marker.lastModified()
    // second run reuses the published table (no re-publish)
    assert(run("q54_warc_ingest")(0).getLong(0) == rows(0).getLong(0))
    assert(marker.lastModified() == mtime, "re-run must not re-publish")
  }

  test("fingerprint keys on content: same path, changed data, different key") {
    val a = Queries.tableFingerprint(dir, "documents")
    val b = Queries.tableFingerprint("/root/testdata/sf0.01", "documents")
    assert(a != b)
    // stable across calls
    assert(Queries.tableFingerprint(dir, "documents") == a)
  }
}
