package org.apache.spark.sql.graft

import scala.collection.mutable

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.datasources._
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

/** Plan a Parquet scan straight from a table manifest: the file list AND
  * every file's size come from manifest metadata, so building the scan
  * performs ZERO filesystem operations — no directory listing, no per-file
  * `getFileStatus`. `spark.read.parquet(files...)` pays one RPC per file at
  * plan time (InMemoryFileIndex re-stats every path); at 10⁶ committed
  * files that is the plan-time metadata storm this module exists to avoid.
  * The public model is Delta's manifest-driven scan planning, where the log
  * supplies (path, size) and the driver never lists the data directory.
  *
  * Partition pruning survives: directory-derived partition values (e.g.
  * `field_column=3`) are parsed here and served through a
  * [[PartitioningAwareFileIndex]], so Catalyst's partition filters prune
  * exactly as they would over a listed directory, and `sizeInBytes` is the
  * TRUE total from the manifest — plan-size estimates (e.g. broadcast
  * decisions over the segment relation) get real numbers, not defaults.
  */
object ManifestScan {

  /** Build the scan, or None when a file's location does not encode the
    * declared partition column (external layouts) — the caller falls back
    * to the listing-based reader.
    *
    * @param files absolute data-file paths with their EXACT sizes (a wrong
    *              size corrupts reads: Parquet footers are located from it)
    */
  def parquetScan(
      spark: SparkSession,
      basePath: Path,
      files: Seq[(Path, Long)],
      fullSchema: StructType,
      partitionColumn: Option[String]): Option[DataFrame] = {
    val session = spark.asInstanceOf[classic.SparkSession]
    val dataSchema = StructType(
      fullSchema.filterNot(f => partitionColumn.contains(f.name)))
    val byDir: Seq[(Path, Seq[(Path, Long)])] =
      files.groupBy(_._1.getParent).toSeq.sortBy(_._1.toString)

    val specOpt: Option[PartitionSpec] = partitionColumn match {
      case scala.None => Some(PartitionSpec.emptySpec)
      case Some(pc) =>
        val partitionSchema = StructType(fullSchema.filter(_.name == pc))
        val parts = byDir.map { case (dir, _) =>
          partitionValue(dir.getName, pc,
            partitionSchema.headOption.map(_.dataType).getOrElse(IntegerType))
            .map(v => PartitionPath(InternalRow(v), dir))
        }
        if (parts.exists(_.isEmpty)) scala.None
        else Some(PartitionSpec(partitionSchema, parts.flatten))
    }

    specOpt.map { spec =>
      val leafDirs: Map[Path, Array[FileStatus]] = byDir.map { case (d, fl) =>
        d -> fl.map { case (p, len) =>
          // Block size/mod-time are synthetic: split planning reads only
          // the length (and maxPartitionBytes conf), and nothing on the
          // batch path consults modification time.
          new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, p)
        }.toArray
      }.toMap
      val index = new ManifestFileIndex(session, Seq(basePath), spec, leafDirs)
      val relation = HadoopFsRelation(index, spec.partitionColumns, dataSchema,
        scala.None, new ParquetFileFormat, Map.empty[String, String])(session)
      session.baseRelationToDataFrame(relation)
    }
  }

  /** `<col>=<value>` directory-name decode for the supported partition
    * value types (segments use an integer `field_column`).
    */
  private def partitionValue(dirName: String, col: String,
      dt: DataType): Option[Any] = {
    if (!dirName.startsWith(s"$col=")) return scala.None
    val raw = dirName.substring(col.length + 1)
    try dt match {
      case IntegerType => Some(raw.toInt)
      case LongType => Some(raw.toLong)
      case StringType =>
        Some(org.apache.spark.unsafe.types.UTF8String.fromString(raw))
      case _ => scala.None
    } catch { case _: NumberFormatException => scala.None }
  }
}

/** A [[PartitioningAwareFileIndex]] whose entire state is handed in from
  * the manifest — `refresh` is a no-op because manifest snapshots are
  * immutable (a new commit is a NEW file list, planned as a new scan).
  */
private final class ManifestFileIndex(
    session: classic.SparkSession,
    override val rootPaths: Seq[Path],
    spec: PartitionSpec,
    dirs: Map[Path, Array[FileStatus]])
  extends PartitioningAwareFileIndex(session, Map.empty, scala.None) {

  override def partitionSpec(): PartitionSpec = spec

  override protected def leafFiles: mutable.LinkedHashMap[Path, FileStatus] = {
    val m = new mutable.LinkedHashMap[Path, FileStatus]()
    dirs.toSeq.sortBy(_._1.toString).foreach { case (_, statuses) =>
      statuses.foreach(st => m += (st.getPath -> st))
    }
    m
  }

  override protected def leafDirToChildrenFiles: Map[Path, Array[FileStatus]] =
    dirs

  override def refresh(): Unit = ()
}
