package graft.tsdb

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.DataGeneration

/** A local filesystem masquerading under a non-`file:` scheme: any code
  * path that drops to `java.io.File` (or hardcodes `file:`) instead of the
  * Hadoop FileSystem API breaks immediately on these URIs — the same
  * failure it would have on s3a:// or abfss://.
  *
  * Statuses are rebuilt with preset permissions because RawLocalFileSystem
  * loads them lazily through `new java.io.File(uri)`, which itself rejects
  * non-file schemes (an artifact of the harness, not of the code under
  * test).
  */
class GraftTestFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")

  private def preset(st: FileStatus): FileStatus = new FileStatus(
    st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
    st.getModificationTime, st.getAccessTime,
    if (st.isDirectory) FsPermission.getDirDefault else FsPermission.getFileDefault,
    "graft", "graft", st.getPath)

  override def getFileStatus(f: Path): FileStatus = preset(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(preset)
}

/** Engine + DataFolder driven through a non-file Hadoop scheme end to end:
  * catalog JSON, compressed writes, manifest commits, snapshot scans,
  * truncate quarantine, and vacuum all speak FileSystem only (the
  * reference reaches its object stores the same way, via object_store
  * URIs — data_folder.rs:29 claims file://, s3://, azure:// parity).
  */
class ObjectStoreSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestSession.spark
    s.sparkContext.hadoopConfiguration.set(
      "fs.graftfs.impl", classOf[GraftTestFileSystem].getName)
    s
  }

  private def newRoot(): String = {
    val local = java.nio.file.Files.createTempDirectory("graft_objstore")
    s"graftfs://${local.toAbsolutePath}"
  }

  private def makePointsDf(n: Int, tag: String) = {
    val rng = new scala.util.Random(13L)
    val ts = DataGeneration.generateTimestamps(n, irregular = false, rng)
    val vs = DataGeneration.generateValues(n, DataGeneration.Linear, Some(0.05f), rng)
    import spark.implicits._
    ts.indices.map(i => (ts(i), vs(i), tag)).toDF("ts_us", "v", "tag")
  }

  test("full table lifecycle over a non-file scheme") {
    val engine = new Engine(spark, newRoot())
    engine.sql("CREATE TIME SERIES TABLE ost(ts_us TIMESTAMP, v FIELD, tag TAG)")
    assert(engine.tables() == Seq("ost"))

    engine.write("ost", makePointsDf(400, "a"))
    engine.write("ost", makePointsDf(100, "b"))
    assert(engine.readTable("ost").count() == 500)
    assert(engine.readTimeSeriesTable("ost", Seq("v"), engine.Aggregate.Count)
      .collect().head.getLong(0) == 500L)

    // SQL over registered views, same scheme.
    assert(engine.sql("SELECT count(*) AS n FROM ost").collect().head.getLong(0)
      == 500L)

    // Manifest snapshots live under the scheme too.
    val fs = new org.apache.hadoop.fs.Path(engine.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[GraftTestFileSystem])
    val snap = TableManifest.latest(fs, engine.dataFolder.tableDir("ost"))
    assert(snap.exists(_.files.nonEmpty))

    engine.sql("TRUNCATE ost")
    assert(engine.readTable("ost").count() == 0)
    engine.sql("VACUUM ost RETAIN 0")
    engine.write("ost", makePointsDf(50, "c"))
    assert(engine.readTable("ost").count() == 50)

    engine.drop("ost")
    assert(engine.tables().isEmpty)
  }

  test("cross-folder segment copy between schemes") {
    val remote = new Engine(spark, newRoot())
    val local = new Engine(spark,
      java.nio.file.Files.createTempDirectory("graft_local").toString)
    remote.sql("CREATE TIME SERIES TABLE xf(ts_us TIMESTAMP, v FIELD, tag TAG)")
    local.sql("CREATE TIME SERIES TABLE xf(ts_us TIMESTAMP, v FIELD, tag TAG)")
    local.write("xf", makePointsDf(300, "a"))
    // local file:// folder -> graftfs:// folder, segments moved verbatim.
    local.copyTimeSeriesTable("xf", "xf", targetEngine = remote)
    assert(remote.readTable("xf").count() == 300)
    assert(remote.dataFolder.segments("xf").count() ==
      local.dataFolder.segments("xf").count())
  }
}
