package graft.tsdb

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}

/** Manifest-based commit protocol for a table directory — the Spark-native
  * shape of the reference's Delta-backed table layer (atomic commit,
  * snapshot reads, real VACUUM of stale files;
  * /root/reference/crates/modelardb_storage/src/data_folder/delta_table_writer.rs:42-260,
  * data_folder/mod.rs:659-683).
  *
  * Data files are written by Spark exactly as before (ZSTD Parquet,
  * partitioned by `field_column` for segments); what makes a file LIVE is
  * its appearance in the newest manifest version under
  * `<tableDir>/_graft_manifest/v<NNNNNNNNNN>.json`. Each manifest is a full
  * snapshot of the live file list (relative paths), so a scan needs exactly
  * one small metadata read regardless of history length, and publishing one
  * is a single-file create — atomic on HDFS-like stores, atomic PUT on
  * object stores. A writer killed mid-job leaves Parquet droppings that no
  * manifest references: scans never see them, and VACUUM removes them once
  * they age past the retention window.
  *
  * Concurrency: version numbers are claimed with create-if-absent
  * (overwrite=false); losing a race throws FileAlreadyExists and the commit
  * retries on top of the new newest snapshot, so concurrent appends both
  * land. Readers that catch a manifest mid-write (non-atomic local FS only)
  * fall back to the previous readable version.
  *
  * At 100 TB the file list itself stays manageable (one entry per ~1 GB
  * Parquet file ≈ 10⁵ lines); a production follow-on would checkpoint the
  * list into Parquet like Delta once it crosses ~10⁶ entries.
  */
private[graft] object TableManifest {

  val DirName = "_graft_manifest"
  private val mapper = new ObjectMapper()
  private val MaxCommitAttempts = 20

  /** `appliedWalBatches` records, atomically with the file list, which
    * write-ahead-log batches this snapshot's data includes — the
    * exactly-once handshake of the durable ingest path: a WAL batch whose
    * id is in the current snapshot must not be replayed (crash after
    * commit, before WAL cleanup), one absent must be (crash before
    * commit). Entries are pruned once their WAL directory is gone.
    */
  final case class Snapshot(version: Long, committedAtMs: Long,
    files: Seq[String], appliedWalBatches: Seq[String] = Seq.empty)

  private def manifestDir(tableDir: String) = new Path(s"$tableDir/$DirName")
  private def versionPath(tableDir: String, v: Long) =
    new Path(manifestDir(tableDir), f"v$v%010d.json")

  /** All manifest versions present, newest first. */
  private def versions(fs: FileSystem, tableDir: String): Seq[Long] = {
    val dir = manifestDir(tableDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong
      }.sorted.reverse
  }

  /** The newest readable snapshot; None means the table predates the
    * manifest layer (scan falls back to full-directory listing).
    */
  def latest(fs: FileSystem, tableDir: String): Option[Snapshot] =
    versions(fs, tableDir).view.flatMap(v => read(fs, tableDir, v)).headOption

  /** A specific historical snapshot, if that version still exists (VACUUM
    * prunes superseded versions past retention).
    */
  def snapshotAt(fs: FileSystem, tableDir: String, version: Long): Option[Snapshot] =
    read(fs, tableDir, version)

  private def read(fs: FileSystem, tableDir: String, v: Long): Option[Snapshot] =
    try {
      val in = fs.open(versionPath(tableDir, v))
      val bytes = try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        out.toString("UTF-8")
      } finally in.close()
      val root = mapper.readTree(bytes)
      val arr = root.get("files")
      val wal = root.get("applied_wal_batches")
      Some(Snapshot(
        root.get("version").asLong(),
        root.get("committed_at_ms").asLong(),
        (0 until arr.size()).map(arr.get(_).asText()),
        if (wal == null) Seq.empty
        else (0 until wal.size()).map(wal.get(_).asText())))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Publish a new snapshot computed from the current one. `update` maps
    * the current live set to the next (append = add new files, truncate =
    * empty). Retries on version-claim races.
    */
  def commit(fs: FileSystem, tableDir: String,
      applyWalBatches: Seq[String] = Seq.empty,
      pruneWalBatches: String => Boolean = _ => false)
      (update: Seq[String] => Seq[String]): Snapshot = {
    var attempt = 0
    while (true) {
      val current = latest(fs, tableDir)
      // Numbering comes from the highest CLAIMED version (readable or
      // not), while content comes from the newest READABLE one: a torn
      // manifest at the head must be skipped over, never collided with
      // forever.
      val maxClaimed = versions(fs, tableDir).headOption.getOrElse(0L)
      val next = Snapshot(
        maxClaimed + 1L,
        System.currentTimeMillis(),
        update(current.map(_.files).getOrElse(Seq.empty)).distinct.sorted,
        ((current.map(_.appliedWalBatches).getOrElse(Seq.empty)
          .filterNot(pruneWalBatches)) ++ applyWalBatches).distinct.sorted)
      val path = versionPath(fs, tableDir, next)
      try {
        val out = fs.create(path, false) // create-if-absent claims the version
        try out.write(toJson(next).getBytes("UTF-8")) finally out.close()
        return next
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException
            | _: java.io.IOException if attempt < MaxCommitAttempts =>
          attempt += 1 // lost the race (or transient IO): re-read and retry
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def versionPath(fs: FileSystem, tableDir: String, next: Snapshot): Path = {
    fs.mkdirs(manifestDir(tableDir))
    versionPath(tableDir, next.version)
  }

  private def toJson(s: Snapshot): String = {
    val root = mapper.createObjectNode()
    root.put("version", s.version)
    root.put("committed_at_ms", s.committedAtMs)
    val arr = root.putArray("files")
    s.files.foreach(arr.add)
    if (s.appliedWalBatches.nonEmpty) {
      val wal = root.putArray("applied_wal_batches")
      s.appliedWalBatches.foreach(wal.add)
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Manifest versions older than `cutoffMs`, excluding the newest (which
    * must always survive).
    */
  def staleVersionPaths(fs: FileSystem, tableDir: String, cutoffMs: Long): Seq[Path] =
    versions(fs, tableDir) match {
      case Seq() => Seq.empty
      case _ +: older => older
        .map(versionPath(tableDir, _))
        .filter(p => fs.getFileStatus(p).getModificationTime < cutoffMs)
    }
}
