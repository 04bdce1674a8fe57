package graft.tools

import org.apache.spark.sql.SparkSession

/** A local filesystem that bills every metadata/data API call like an
  * object store: one counted RPC plus [[SlowCountingFs.delayMs]] of
  * latency (the S3 regime the manifest design targets). Registered under
  * the `slowfs://` scheme; paths resolve to the local disk, so real bytes
  * flow while the probe measures HOW MANY round trips the commit and
  * planning protocols pay.
  */
class SlowCountingFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  import SlowCountingFs._
  import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus}
  import org.apache.hadoop.fs.Path
  override def getUri: java.net.URI = java.net.URI.create("slowfs:///")
  private def rpc[T](f: => T): T = {
    calls.incrementAndGet()
    if (delayMs > 0) Thread.sleep(delayMs)
    f
  }
  override def getFileStatus(p: Path): FileStatus = rpc(super.getFileStatus(p))
  override def listStatus(p: Path): Array[FileStatus] = rpc(super.listStatus(p))
  override def open(p: Path, bufferSize: Int): FSDataInputStream =
    rpc(super.open(p, bufferSize))
  override def create(p: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): FSDataOutputStream =
    rpc(super.create(p, permission, overwrite, bufferSize, replication,
      blockSize, progress))
  // RawLocalFileSystem implements this overload directly (it does NOT
  // funnel into the permission form above) — FileSystem.create(Path, …)
  // convenience calls land here.
  override def create(p: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): FSDataOutputStream =
    rpc(super.create(p, overwrite, bufferSize, replication, blockSize,
      progress))
  override def createNonRecursive(p: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag],
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): FSDataOutputStream =
    rpc(super.createNonRecursive(p, permission, flags, bufferSize,
      replication, blockSize, progress))
  override def rename(src: Path, dst: Path): Boolean =
    rpc(super.rename(src, dst))
  override def delete(p: Path, recursive: Boolean): Boolean =
    rpc(super.delete(p, recursive))
  override def mkdirs(p: Path,
      permission: org.apache.hadoop.fs.permission.FsPermission): Boolean =
    rpc(super.mkdirs(p, permission))
}

object SlowCountingFs {
  val calls = new java.util.concurrent.atomic.AtomicLong()
  @volatile var delayMs: Long = 50L
}

/** Manifest planner at the 100 TB limit shape: 10^6 live files (~100 TB at
  * ~100 MB/file), all carrying per-file stats. Measures checkpoint commit,
  * delta commits, head resolution, time-range skipping, and planning a
  * pruned scan over phantom paths — all driver-side metadata work that must
  * stay flat in file count and do ZERO filesystem RPCs at plan time.
  * Run: sbt "Test/runMain graft.tools.ManifestScaleProbe [nFiles]"
  */
object ManifestScaleProbe {
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("graft_manifest_1m")
      .toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    val initial = (0 until nFiles).map(i => f"field_column=0/part-$i%07d.parquet")
    val initialStats = initial.zipWithIndex.map { case (rel, i) =>
      rel -> graft.tsdb.TableManifest.FileStats(
        100L * 1024 * 1024, i * 3600_000000L, (i + 1) * 3600_000000L - 1)
    }.toMap
    timed(f"checkpoint commit ($nFiles%,d files + stats)") {
      graft.tsdb.TableManifest.commit(fs, dir, stats = initialStats)(_ => initial)
    }
    timed("25 delta commits (+4 files each)") {
      (0 until 25).foreach { c =>
        graft.tsdb.TableManifest.commit(fs, dir) { live =>
          live ++ (0 until 4).map(j => f"field_column=0/new-$c%03d-$j.parquet")
        }
      }
    }
    graft.tsdb.TableManifest.dropCachedSnapshots()
    val resolved = timed("COLD head resolution (checkpoint + deltas)") {
      graft.tsdb.TableManifest.latest(fs, dir).get
    }
    timed("warm head resolution (cache)") {
      graft.tsdb.TableManifest.latest(fs, dir).get
    }
    assert(resolved.files.size == nFiles + 100)
    assert(resolved.fileStats.size == nFiles)
    val sizes = new java.io.File(s"$dir/${graft.tsdb.TableManifest.DirName}")
      .listFiles().map(f => (f.getName, f.length()))
    val cpBytes = sizes.filter(_._1.endsWith(".parquet")).map(_._2).sum
    println(f"  checkpoints on disk: ${cpBytes / 1024.0 / 1024.0}%.1f MiB")

    // A one-hour range keeps exactly 1 stats-ful file; the 100 stats-less
    // delta adds are conservatively kept (absent stats never skip).
    val lo = (nFiles / 2).toLong * 3600_000000L
    val hi = lo + 3600_000000L - 1
    val kept = timed(f"time-range file skipping (${nFiles + 100}%,d files)") {
      resolved.files.filter { rel =>
        resolved.fileStats.get(rel)
          .forall(s => s.maxEndUs >= lo && s.minStartUs <= hi)
      }
    }
    assert(kept.size == 101, s"expected 101 kept, got ${kept.size}")

    val base = new org.apache.hadoop.fs.Path(s"file:$dir/tables/phantom")
    val schema = graft.tsdb.SegmentSchema.forTags(Seq("tag"))
    val withSizes = resolved.files.map { rel =>
      (new org.apache.hadoop.fs.Path(base, rel),
        resolved.fileStats.get(rel).map(_.sizeBytes).getOrElse(1L))
    }
    timed(f"plan full scan over ${nFiles + 100}%,d phantom files") {
      val df = org.apache.spark.sql.graft.ManifestScan
        .parquetScan(spark, base, withSizes, schema, Some("field_column")).get
      df.queryExecution.executedPlan
    }
    timed(f"plan filtered scan over ${nFiles + 100}%,d phantom files") {
      val df = org.apache.spark.sql.graft.ManifestScan
        .parquetScan(spark, base, withSizes, schema, Some("field_column")).get
      df.where(org.apache.spark.sql.functions.col("end_time") >= lo)
        .queryExecution.executedPlan
    }

    // ---- S3-regime probe: every filesystem call costs 50 ms. ----
    // The zero-RPC planning claim above is proven on local disk; this
    // phase proves commit + head resolution stay O(1) ROUND TRIPS in file
    // count, so the wall-times transfer to an object store. Two manifest
    // sizes (1k / 20k files) must bill the SAME RPC counts.
    println("-- slowfs (50 ms per FS call, counting round trips) --")
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.slowfs.impl", classOf[SlowCountingFs].getName)
    hconf.setBoolean("fs.slowfs.impl.disable.cache", true)
    def rpcCounted[T](label: String)(f: => T): (T, Long) = {
      val before = SlowCountingFs.calls.get()
      val t0 = System.nanoTime()
      val r = f
      val n = SlowCountingFs.calls.get() - before
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
        f"$n%4d RPCs")
      (r, n)
    }
    def slowRun(n: Int): (Long, Long, Long) = {
      graft.tsdb.TableManifest.dropCachedSnapshots()
      val local = java.nio.file.Files.createTempDirectory("graft_slowfs")
      val sdir = s"slowfs://${local.toString}"
      val sfs = new org.apache.hadoop.fs.Path(sdir).getFileSystem(hconf)
      val files = (0 until n).map(i => f"field_column=0/part-$i%07d.parquet")
      val stats = files.zipWithIndex.map { case (rel, i) =>
        rel -> graft.tsdb.TableManifest.FileStats(
          100L * 1024 * 1024, i * 3600_000000L, (i + 1) * 3600_000000L - 1)
      }.toMap
      val (_, cpRpcs) = rpcCounted(f"  checkpoint commit ($n%,d files)") {
        graft.tsdb.TableManifest.commit(sfs, sdir, stats = stats)(_ => files)
      }
      val (_, deltaRpcs) = rpcCounted("  5 delta commits") {
        (0 until 5).foreach { c =>
          graft.tsdb.TableManifest.commit(sfs, sdir)(
            live => live :+ f"field_column=0/new-$c%03d.parquet")
        }
      }
      graft.tsdb.TableManifest.dropCachedSnapshots()
      val (snap, headRpcs) = rpcCounted("  COLD head resolution") {
        graft.tsdb.TableManifest.latest(sfs, sdir).get
      }
      assert(snap.files.size == n + 5)
      (cpRpcs, deltaRpcs, headRpcs)
    }
    // Both sizes use the checkpoint representation, so the protocol must
    // bill IDENTICAL round-trip counts — O(1) in file count. (A 1k-file
    // table commits inline and legitimately bills a couple fewer reads.)
    val small = slowRun(20000)
    val large = slowRun(200000)
    assert(small == large,
      s"RPC counts must be flat in file count: 20k=$small vs 200k=$large")
    assert(large._2 <= 60, s"5 delta commits billed ${large._2} RPCs (>12 each)")
    assert(large._3 <= 40, s"cold head resolution billed ${large._3} RPCs")
    println(s"  RPC counts flat in file count: 20k files = $small, " +
      s"200k files = $large (checkpoint, 5 deltas, cold head)")
    spark.stop()
  }
}
