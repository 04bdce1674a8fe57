package graft.tsdb

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.DataGeneration

/** The write-ahead log's exactly-once contract across every crash point
  * (the reference's WAL guarantees, write_ahead_log.rs:42-220):
  *
  *  - crash before the segment commit → recover REPLAYS the batch;
  *  - crash after the commit, before WAL cleanup → recover SKIPS and
  *    cleans it (the manifest's appliedWalBatches is the handshake);
  *  - torn WAL write (no _SUCCESS) → recover discards it;
  *  - the happy path leaves no WAL residue and prunes the applied list.
  */
class WalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def newEngine(): Engine =
    new Engine(spark, Files.createTempDirectory("graft_wal").toString)

  private def makePointsDf(n: Int, tag: String, seed: Long = 3L) = {
    val rng = new scala.util.Random(seed)
    val ts = DataGeneration.generateTimestamps(n, irregular = false, rng)
    val vs = DataGeneration.generateValues(n, DataGeneration.Linear, Some(0.05f), rng)
    import spark.implicits._
    ts.indices.map(i => (ts(i), vs(i), tag)).toDF("ts_us", "v", "tag")
  }

  private def snapshot(engine: Engine, table: String) =
    TableManifest.latest(engine.dataFolder.fileSystem,
      engine.dataFolder.tableDir(table)).get

  test("durable write ingests once and leaves no WAL residue") {
    val engine = newEngine()
    engine.sql("CREATE TIME SERIES TABLE wd(ts_us TIMESTAMP, v FIELD, tag TAG)")
    engine.writeDurable("wd", makePointsDf(300, "a"))
    assert(engine.readTable("wd").count() == 300)
    assert(engine.dataFolder.walBatchDirs("wd").isEmpty,
      "applied batches must be cleaned up")
    // The applied id stays recorded until its directory is gone AND a
    // later commit prunes it.
    assert(snapshot(engine, "wd").appliedWalBatches.size == 1)
    engine.writeDurable("wd", makePointsDf(100, "b"))
    assert(engine.readTable("wd").count() == 400)
    assert(snapshot(engine, "wd").appliedWalBatches.size == 1,
      "cleaned batch ids are pruned at the next commit")
    assert(engine.recover("wd").isEmpty, "nothing to recover on a clean table")
  }

  test("crash before commit: recover replays the batch exactly once") {
    val engine = newEngine()
    engine.sql("CREATE TIME SERIES TABLE wr(ts_us TIMESTAMP, v FIELD, tag TAG)")
    engine.writeDurable("wr", makePointsDf(200, "a"))

    // Simulate: WAL write completed, then the process died before the
    // compression/commit ever ran.
    engine.dataFolder.walAppend("wr", makePointsDf(150, "b"))
    assert(engine.readTable("wr").count() == 200,
      "unapplied WAL data must not be visible")

    val replayed = engine.recover("wr")
    assert(replayed.size == 1)
    assert(engine.readTable("wr").count() == 350, "recover lands the batch")
    assert(engine.dataFolder.walBatchDirs("wr").isEmpty)
    assert(engine.recover("wr").isEmpty, "recovery is idempotent")
    assert(engine.readTable("wr").count() == 350)
  }

  test("crash after commit before cleanup: recover skips, never double-ingests") {
    val engine = newEngine()
    engine.sql("CREATE TIME SERIES TABLE ws(ts_us TIMESTAMP, v FIELD, tag TAG)")
    // Simulate: batch applied and committed (id recorded), but the process
    // died before walDelete ran — the WAL directory is still there.
    val batchId = engine.dataFolder.walAppend("ws", makePointsDf(120, "a"))
    engine.dataFolder.write("ws",
      engine.dataFolder.walRead("ws", batchId), Seq(batchId))
    assert(engine.readTable("ws").count() == 120)
    assert(engine.dataFolder.walBatchDirs("ws") == Seq(batchId))

    assert(engine.recover("ws").isEmpty, "committed batch must not replay")
    assert(engine.readTable("ws").count() == 120, "no double ingest")
    assert(engine.dataFolder.walBatchDirs("ws").isEmpty, "stale dir cleaned")
  }

  test("torn WAL writes are discarded, not replayed") {
    val engine = newEngine()
    engine.sql("CREATE TIME SERIES TABLE wt(ts_us TIMESTAMP, v FIELD, tag TAG)")
    engine.writeDurable("wt", makePointsDf(100, "a"))
    // A batch directory without _SUCCESS: the writer died mid-write and
    // never got an ack, so the data was never durable.
    val torn = new java.io.File(s"${engine.root}/wal/wt/b9999999999999-dead")
    torn.mkdirs()
    assert(engine.recover("wt").isEmpty)
    assert(!torn.exists(), "torn WAL batch must be discarded")
    assert(engine.readTable("wt").count() == 100)
  }

  test("normal tables ride the same WAL path") {
    val engine = newEngine()
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("s",
        org.apache.spark.sql.types.StringType)))
    engine.create(TableMetadata("wn", "normal", Seq.empty, schema.json))
    engine.writeDurable("wn", Seq((1L, "x"), (2L, "y")).toDF("k", "s"))
    assert(engine.readTable("wn").count() == 2)
    engine.dataFolder.walAppend("wn", Seq((3L, "z")).toDF("k", "s"))
    assert(engine.recover("wn").size == 1)
    assert(engine.readTable("wn").count() == 3)
  }

  test("vacuum sweeps unreplayable WAL leftovers, keeps pending batches") {
    val engine = newEngine()
    engine.sql("CREATE TIME SERIES TABLE wv(ts_us TIMESTAMP, v FIELD, tag TAG)")
    engine.writeDurable("wv", makePointsDf(100, "a"))

    // Applied-but-undeleted batch (crash before cleanup, recover never ran).
    val appliedId = engine.dataFolder.walAppend("wv", makePointsDf(60, "b"))
    engine.dataFolder.write("wv",
      engine.dataFolder.walRead("wv", appliedId), Seq(appliedId))
    // Torn write (no _SUCCESS).
    val torn = new java.io.File(s"${engine.root}/wal/wv/b9999999999999-torn")
    torn.mkdirs()
    // Complete, UNAPPLIED batch: pending durable data.
    val pendingId = engine.dataFolder.walAppend("wv", makePointsDf(40, "c"))

    def age(name: String): Unit = {
      val f = new java.io.File(s"${engine.root}/wal/wv/$name")
      f.setLastModified(System.currentTimeMillis() - 1000L)
    }
    Seq(appliedId, "b9999999999999-torn", pendingId).foreach(age)

    engine.sql("VACUUM wv RETAIN 0")
    assert(engine.dataFolder.walBatchDirs("wv") == Seq(pendingId),
      "vacuum removes applied/torn WAL dirs but never pending data")
    assert(engine.recover("wv") == Seq(pendingId),
      "the pending batch survives vacuum and still replays")
    assert(engine.readTable("wv").count() == 200)
  }

  test("truncate and drop discard pending WAL batches") {
    val engine = newEngine()
    engine.sql("CREATE TIME SERIES TABLE wx(ts_us TIMESTAMP, v FIELD, tag TAG)")
    engine.writeDurable("wx", makePointsDf(100, "a"))
    engine.dataFolder.walAppend("wx", makePointsDf(50, "b"))
    engine.truncate("wx")
    assert(engine.dataFolder.walBatchDirs("wx").isEmpty,
      "truncate discards pending WAL batches")
    assert(engine.recover("wx").isEmpty)
    assert(engine.readTable("wx").count() == 0)
  }
}
