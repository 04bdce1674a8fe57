package graft.tsdb

import java.util.{Map => JMap}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Manifest-offset streaming source for segment tables — the fix for the
  * directory file-stream's two delivery holes: OPTIMIZE renames rewritten
  * files (carrying OLD data) into the partition directories a directory
  * stream watches, re-emitting every compacted point as a fresh
  * micro-batch, and a killed append leaves moved-but-never-committed files
  * a directory stream emits though no snapshot scan ever will.
  *
  * The Spark-native shape of streaming a Delta table: stream OFFSETS are
  * manifest versions. Each micro-batch (a, b] plans the DATA-CARRYING adds
  * of versions a+1..b — new files in a commit's diff that are not
  * compaction outputs (those carry the [[DataFolder.CompactedFilePrefix]]
  * name prefix and only re-package already-delivered points). A consumer
  * starting from scratch anchors its own initial snapshot: the first
  * resolvable version's FULL live list (compacted files included there —
  * they are the only copy of their points), then increments. Nothing
  * reaches the stream before its manifest commit, nothing reaches it
  * twice, and commits pay zero extra I/O for streaming.
  *
  * Retention contract (same as Delta's streaming source): a consumer that
  * falls behind VACUUM's retention window — its anchor version pruned, or
  * pruned versions inside an unprocessed window — fails LOUDLY instead of
  * silently double- or under-delivering. Reads of files a concurrent
  * TRUNCATE quarantined are skipped (`ignoreMissingFiles` semantics).
  *
  * Scale shape: latestOffset is the O(1) hint-probed head; planning probes
  * only the (a, b] window (existence + cached snapshot resolution), never
  * the full version listing except once at a fresh consumer's anchor; one
  * input partition per segment file keeps read parallelism at the file
  * grain with no shuffle.
  */
final class SegmentStreamProvider extends TableProvider {
  import SegmentStream._

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DataType.fromJson(options.get(SchemaOption)).asInstanceOf[StructType]

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SegmentStreamTable(schema, properties.get(DirOption))
}

private[tsdb] object SegmentStream {
  val DirOption = "graft.tabledir"
  val SchemaOption = "graft.segmentschema"

  /** Greatest version ≤ `from` whose snapshot resolves; walking past an
    * ABSENT version (claims are contiguous, so absence = VACUUM pruned it)
    * is a retention-window violation for an anchored consumer.
    */
  private def resolvableAtOrBelow(fs: FileSystem, tableDir: String,
      from: Long): Option[TableManifest.Snapshot] = {
    var v = from
    while (v >= 1L) {
      val snap = TableManifest.snapshotAt(fs, tableDir, v)
      if (snap.nonEmpty) return snap
      if (!fs.exists(TableManifest.versionJsonPath(tableDir, v)))
        throw new IllegalStateException(
          s"Streaming read of $tableDir fell behind the retention window: " +
            s"manifest version $v was pruned by VACUUM before this " +
            "consumer processed it. Restart the stream from a fresh " +
            "checkpoint to re-anchor at the current snapshot.")
      v -= 1 // torn claim: fold into the next readable version's diff
    }
    scala.None
  }

  /** The data files micro-batch (a, b] must deliver. */
  def addsBetween(fs: FileSystem, tableDir: String, a: Long, b: Long): Seq[String] = {
    if (b <= a) return Seq.empty
    val out = Seq.newBuilder[String]
    // Anchor: the resolved live set the first diff builds on. a == 0 is a
    // fresh consumer — its anchor is the initial snapshot itself.
    var prev: Option[Set[String]] =
      if (a == 0L) scala.None
      else Some(resolvableAtOrBelow(fs, tableDir, a)
        .map(_.files.toSet).getOrElse(Set.empty))
    var v = if (a == 0L) {
      // Fresh consumer on a table whose early history was already pruned:
      // start at the oldest surviving version (one listing, once ever).
      TableManifest.claimedVersions(fs, tableDir).headOption.getOrElse(b + 1)
    } else a + 1L
    while (v <= b) {
      TableManifest.snapshotAt(fs, tableDir, v) match {
        case Some(snap) =>
          prev match {
            case scala.None =>
              out ++= snap.files // initial snapshot: full, unfiltered
            case Some(pf) =>
              out ++= snap.files.filterNot(pf)
                .filterNot(isCompacted) // rewrites carry no new points
          }
          prev = Some(snap.files.toSet)
        case scala.None =>
          if (!fs.exists(TableManifest.versionJsonPath(tableDir, v))) {
            if (prev.isEmpty)
              throw new IllegalStateException(
                s"Streaming read of $tableDir found no resolvable manifest " +
                  s"at or above pruned version $v; restart from a fresh " +
                  "checkpoint.")
            throw new IllegalStateException(
              s"Streaming read of $tableDir fell behind the retention " +
                s"window: manifest version $v was pruned by VACUUM before " +
                "this consumer processed it. Restart the stream from a " +
                "fresh checkpoint to re-anchor at the current snapshot.")
          }
          // Torn claim: contributed nothing; folds into the next diff.
      }
      v += 1L
    }
    out.result()
  }

  def isCompacted(rel: String): Boolean =
    rel.substring(rel.lastIndexOf('/') + 1)
      .startsWith(DataFolder.CompactedFilePrefix)
}

private final class SegmentStreamTable(tableSchema: StructType, tableDir: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-segments(`$tableDir`)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SegmentMicroBatchStream(tableSchema, tableDir)
      }
    }
}

/** One offset = one manifest version; everything at or below it has been
  * delivered.
  */
private final case class SegmentVersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private final class SegmentMicroBatchStream(schema: StructType, tableDir: String)
    extends MicroBatchStream {
  // Driver-side construction: capture the session's Hadoop conf for the
  // executors (custom serializable wrapper — no Spark-private helpers).
  private val conf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  @transient private lazy val fs: FileSystem =
    new Path(tableDir).getFileSystem(conf.value)

  override def initialOffset(): Offset = SegmentVersionOffset(0L)

  override def latestOffset(): Offset = SegmentVersionOffset(
    TableManifest.headVersion(fs, tableDir).getOrElse(0L))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[SegmentVersionOffset].version
    val b = end.asInstanceOf[SegmentVersionOffset].version
    SegmentStream.addsBetween(fs, tableDir, a, b)
      .map(rel => SegmentFilePartition(rel): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SegmentFileReaderFactory(schema, tableDir, conf)

  override def deserializeOffset(json: String): Offset =
    SegmentVersionOffset(
      new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(json).get("version").asLong())

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private final case class SegmentFilePartition(rel: String) extends InputPartition

/** Reads one committed segment file via parquet-mr (micro-batch grain;
  * the vectorized scan is not reachable from a DSv2 streaming reader),
  * deriving the directory-partition `field_column` from the path. A
  * missing file is an empty read — the `ignoreMissingFiles` contract for
  * a stream racing TRUNCATE's quarantine.
  */
private final class SegmentFileReaderFactory(schema: StructType,
    tableDir: String, conf: SerializableHadoopConf)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rel = partition.asInstanceOf[SegmentFilePartition].rel
    val path = new Path(tableDir, rel)
    val fs = path.getFileSystem(conf.value)
    val fieldColumn: Int = rel.split('/').collectFirst {
      case seg if seg.startsWith(s"${SegmentSchema.FieldColumn}=") =>
        seg.substring(SegmentSchema.FieldColumn.length + 1).toInt
    }.getOrElse(throw new IllegalStateException(
      s"Segment file path $rel has no ${SegmentSchema.FieldColumn}= component."))
    val reader =
      if (!fs.exists(path)) scala.None
      else Some(ParquetReader.builder(new GroupReadSupport(), path)
        .withConf(conf.value).build())

    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = reader match {
        case scala.None => false
        case Some(r) =>
          val g = r.read()
          if (g == null) { current = null; false }
          else {
            val values = schema.fields.map { f =>
              if (f.name == SegmentSchema.FieldColumn) fieldColumn
              else f.dataType match {
                case ByteType => g.getInteger(f.name, 0).toByte
                case IntegerType => g.getInteger(f.name, 0)
                case LongType => g.getLong(f.name, 0)
                case FloatType => g.getFloat(f.name, 0)
                case BinaryType => g.getBinary(f.name, 0).getBytes
                case StringType => UTF8String.fromString(g.getString(f.name, 0))
                case other => throw new IllegalStateException(
                  s"Segment schema has no streaming reader for type $other.")
              }
            }
            current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
            true
          }
      }
      override def get(): InternalRow = current
      override def close(): Unit = reader.foreach(_.close())
    }
  }
}

/** Hadoop Configuration is not Serializable; ship it by its own
  * write/readFields wire format (the standard trick, re-implemented here
  * to stay off Spark-private helpers).
  */
private final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
