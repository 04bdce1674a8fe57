package graft.tsdb

import java.nio.file.Files

import org.apache.hadoop.fs.{FileSystem, Path}
import org.scalatest.funsuite.AnyFunSuite

/** The manifest-offset stream's commit fences: end offsets never advance
  * past an in-flight (claimed-but-unreadable) manifest, anchors that cannot
  * resolve fall back to full-snapshot delivery, and rewrite suppression is
  * keyed off the commit's own `rewrites` record rather than file names.
  * These close the torn-claim data-loss hole: a slow writer's manifest that
  * completes AFTER the stream committed an offset past it would otherwise
  * resolve into the next trigger's anchor and never be delivered.
  */
class SegmentStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def newDir(): String =
    Files.createTempDirectory("graft_segstream").toString

  private def fsFor(dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Handcraft one manifest version (bypasses TableManifest.commit so the
    * snapshot cache never sees it — these tests need raw on-disk states,
    * including unreadable ones).
    */
  private def putManifest(fs: FileSystem, dir: String, v: Long,
      files: Seq[String], rewrites: Option[Seq[String]] = Some(Seq.empty)): Unit = {
    val fileList = files.map(f => "\"" + f + "\"").mkString("[", ",", "]")
    val rw = rewrites.map(_.map(f => "\"" + f + "\"").mkString("[", ",", "]"))
      .map(r => s""","rewrites":$r""").getOrElse("")
    val json = s"""{"version":$v,"committed_at_ms":1$rw,"files":$fileList}"""
    val out = fs.create(TableManifest.versionJsonPath(dir, v), true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
  }

  private def putTorn(fs: FileSystem, dir: String, v: Long,
      ageMs: Long = 0L): Unit = {
    val p = TableManifest.versionJsonPath(dir, v)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write("{\"version\":".getBytes("UTF-8")) finally out.close()
    if (ageMs > 0L) fs.setTimes(p, System.currentTimeMillis() - ageMs, -1L)
  }

  test("end offset never advances past a fresh torn claim") {
    val dir = newDir(); val fs = fsFor(dir)
    putManifest(fs, dir, 1L, Seq("a.parquet"))
    putManifest(fs, dir, 2L, Seq("a.parquet", "b.parquet"))
    putTorn(fs, dir, 3L)
    val now = System.currentTimeMillis()
    assert(SegmentStream.latestDeliverable(fs, dir, 0L, 3L,
      SegmentStream.TornClaimGraceMs, now) == 2L,
      "a fresh in-flight claim must fence the end offset")

    // The slow writer completes: the very next probe delivers it.
    putManifest(fs, dir, 3L, Seq("a.parquet", "b.parquet", "c.parquet"))
    assert(SegmentStream.latestDeliverable(fs, dir, 0L, 3L,
      SegmentStream.TornClaimGraceMs, now) == 3L)
    assert(SegmentStream.addsBetween(fs, dir, 2L, 3L) == Seq("c.parquet"),
      "the completed claim's files must be delivered, not anchored away")
  }

  test("an aged torn claim is skipped only once a readable successor exists") {
    val dir = newDir(); val fs = fsFor(dir)
    putManifest(fs, dir, 1L, Seq("a.parquet"))
    putTorn(fs, dir, 2L, ageMs = 3600L * 1000L)
    val now = System.currentTimeMillis()
    // Aged but unshadowed: the writer is presumed dead, yet nothing proves
    // the commit layer moved past it — stay fenced.
    assert(SegmentStream.latestDeliverable(fs, dir, 0L, 2L, 1000L, now) == 1L)

    // A readable successor exists (its commit already excluded the torn
    // version from history, as batch scans do): step over the dead claim.
    putManifest(fs, dir, 3L, Seq("a.parquet", "d.parquet"))
    assert(SegmentStream.latestDeliverable(fs, dir, 0L, 3L, 1000L, now) == 3L)
    assert(SegmentStream.addsBetween(fs, dir, 1L, 3L) == Seq("d.parquet"))
  }

  test("an unresolvable anchor falls back to full-snapshot delivery") {
    val dir = newDir(); val fs = fsFor(dir)
    // Every version at or below the checkpointed anchor is torn; the first
    // resolvable version contains a compaction output that is the ONLY
    // copy of its points — diffing against an empty set would drop it.
    putTorn(fs, dir, 1L)
    putTorn(fs, dir, 2L)
    putManifest(fs, dir, 3L, Seq("opt-c.parquet", "x.parquet"),
      rewrites = Some(Seq("opt-c.parquet")))
    assert(SegmentStream.addsBetween(fs, dir, 2L, 3L).sorted ==
      Seq("opt-c.parquet", "x.parquet"),
      "first resolvable version after a dead anchor is an initial snapshot")
  }

  test("rewrite suppression keys off the commit record, not file names") {
    val dir = newDir(); val fs = fsFor(dir)
    putManifest(fs, dir, 1L, Seq("a.parquet"))
    // A commit that ADDS a file whose name happens to carry the compaction
    // prefix (e.g. a cross-folder copy preserving names) declares no
    // rewrites — it carries new data and must be delivered.
    putManifest(fs, dir, 2L, Seq("a.parquet", "opt-copied.parquet"))
    assert(SegmentStream.addsBetween(fs, dir, 1L, 2L) == Seq("opt-copied.parquet"),
      "declared-empty rewrites means every add carries data")
    // A genuine compaction commit declares its outputs; nothing delivered.
    putManifest(fs, dir, 3L, Seq("merged.parquet"),
      rewrites = Some(Seq("merged.parquet")))
    assert(SegmentStream.addsBetween(fs, dir, 2L, 3L).isEmpty,
      "declared rewrites are suppressed regardless of file name")
    // Legacy manifest (no rewrites field): the name heuristic still holds.
    putManifest(fs, dir, 4L, Seq("merged.parquet", "opt-legacy.parquet"),
      rewrites = scala.None)
    assert(SegmentStream.addsBetween(fs, dir, 3L, 4L).isEmpty,
      "legacy manifests fall back to the opt- prefix heuristic")
  }

  test("a pruned version inside the probe window exposes head for loud failure") {
    val dir = newDir(); val fs = fsFor(dir)
    // Versions 1-2 vacuumed away; 3 survives. An anchored consumer at 1
    // must hit the retention-violation error, not a silent stall: the
    // probe passes head through and planning throws.
    putManifest(fs, dir, 3L, Seq("a.parquet"))
    assert(SegmentStream.latestDeliverable(fs, dir, 1L, 3L, 1000L,
      System.currentTimeMillis()) == 3L)
    val err = intercept[IllegalStateException](
      SegmentStream.addsBetween(fs, dir, 1L, 3L))
    assert(err.getMessage.contains("retention window"))
  }

  test("legacy directory-stream checkpoints fail with a clear error") {
    val dir = newDir(); val fs = fsFor(dir)
    putManifest(fs, dir, 1L, Seq("a.parquet"))
    val schema = SegmentSchema.forTags(Seq("tag"))
    val props = new java.util.HashMap[String, String]()
    props.put(SegmentStream.DirOption, fs.makeQualified(new Path(dir)).toString)
    val stream = new SegmentStreamProvider()
      .getTable(schema, Array.empty, props)
      .asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(props))
      .build().toMicroBatchStream("unused")
    // FileStreamSource offsets carry no "version" field.
    val err = intercept[IllegalStateException](
      stream.deserializeOffset("""{"logOffset":2}"""))
    assert(err.getMessage.contains("fresh checkpoint"))
    assert(stream.deserializeOffset("""{"version":5}""").json().contains("5"))
  }
}
