package graft.tools

import org.apache.spark.sql.SparkSession

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
    spark.stop()
  }
}
