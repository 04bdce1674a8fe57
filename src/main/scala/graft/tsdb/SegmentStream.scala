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
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
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
  * Scale shape: latestOffset starts from the O(1) hint-probed head, then
  * confirms resolvability only for versions committed since the last
  * trigger (never past a torn in-flight claim — see
  * [[SegmentStream.latestDeliverable]]); planning probes only the (a, b]
  * window (existence + cached snapshot resolution), never the full version
  * listing except once at a fresh consumer's anchor; one input partition
  * per segment file keeps read parallelism at the file grain with no
  * shuffle.
  */
final class SegmentStreamProvider extends TableProvider {
  import SegmentStream._

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DataType.fromJson(options.get(SchemaOption)).asInstanceOf[StructType]

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SegmentStreamTable(schema, properties.get(DirOption),
      Option(properties.get(MaxVersionsOption)).map(_.toLong))
}

private[tsdb] object SegmentStream {
  val DirOption = "graft.tabledir"
  val SchemaOption = "graft.segmentschema"

  /** Admission control: at most this many manifest versions per
    * micro-batch (Delta's maxFilesPerTrigger analog at this source's
    * offset grain). Bounds a catch-up: a consumer far behind the head
    * processes the backlog as several bounded batches instead of one
    * giant one. Unset = drain to the fenced head every trigger.
    */
  val MaxVersionsOption = "graft.maxversionspertrigger"

  /** How long a claimed-but-unreadable manifest may block the stream's end
    * offset before it is treated as a crashed writer's permanent dropping.
    * A manifest JSON exists from `fs.create` until `close` while still
    * unreadable (non-atomic local FS), so the head probe must NEVER commit
    * an offset past a fresh torn claim: if its writer completed after the
    * offset advanced, the next trigger's anchor would resolve the completed
    * version and its files would land in `prev` undelivered — silent loss.
    * Past the grace window, and only once a READABLE successor exists
    * (whose commit was built skipping the torn version, so batch scans
    * exclude it from history too), the claim is provably dead and the
    * stream steps over it.
    */
  private[tsdb] val TornClaimGraceMs = 60000L

  /** The highest version the stream may expose as its end offset: probe
    * forward from `floor` (everything at or below it is already delivered)
    * through versions whose snapshot actually RESOLVES. O(new versions
    * since the last trigger) — each resolution lands in the snapshot cache
    * the planner reads right after.
    */
  private[tsdb] def latestDeliverable(fs: FileSystem, tableDir: String,
      floor: Long, head: Long, graceMs: Long, nowMs: Long): Long = {
    if (head <= floor) return floor
    var last = floor
    var v = floor + 1L
    if (floor == 0L && !fs.exists(TableManifest.versionJsonPath(tableDir, 1L))) {
      // Fresh consumer over pruned early history: leap to the oldest
      // surviving claim (one listing, once ever per consumer).
      TableManifest.claimedVersions(fs, tableDir).headOption match {
        case Some(oldest) => last = oldest - 1L; v = oldest
        case scala.None => return 0L
      }
    }
    while (v <= head) {
      if (TableManifest.snapshotAt(fs, tableDir, v).nonEmpty) {
        last = v; v += 1L
      } else if (!fs.exists(TableManifest.versionJsonPath(tableDir, v))) {
        // Pruned inside an undelivered window: expose head so planning
        // fails LOUDLY with the retention-violation error instead of the
        // stream silently stalling here forever.
        return head
      } else {
        // Torn claim. Skip only a provably-dead one: aged past the grace
        // window AND shadowed by a readable successor.
        val aged =
          try nowMs - fs.getFileStatus(
            TableManifest.versionJsonPath(tableDir, v)).getModificationTime > graceMs
          catch { case scala.util.control.NonFatal(_) => false }
        if (!aged) return last
        var w = v + 1L
        var succ = -1L
        while (w <= head && succ < 0L) {
          if (TableManifest.snapshotAt(fs, tableDir, w).nonEmpty) succ = w
          else w += 1L
        }
        if (succ < 0L) return last
        last = succ; v = succ + 1L
      }
    }
    last
  }

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
  def addsBetween(fs: FileSystem, tableDir: String, a: Long, b: Long): Seq[String] =
    addsByVersion(fs, tableDir, a, b).flatMap(_._2)

  /** [[addsBetween]] with per-commit attribution: (version, the data files
    * that commit added) for every contributing version in (a, b]. Shared
    * by the streaming source (flattened) and the CDC batch read (which
    * stamps each file set with its commit version).
    */
  def addsByVersion(fs: FileSystem, tableDir: String,
      a: Long, b: Long): Seq[(Long, Seq[String])] = {
    if (b <= a) return Seq.empty
    val out = Seq.newBuilder[(Long, Seq[String])]
    // Anchor: the resolved live set the first diff builds on. a == 0 is a
    // fresh consumer — its anchor is the initial snapshot itself. An
    // anchored offset below which NOTHING resolves (every version torn:
    // only reachable through a checkpoint written before torn-claim
    // fencing) means no data was ever delivered either, so the first
    // resolvable version must ALSO be a full initial snapshot — diffing it
    // against an empty set would filter out compaction outputs, which are
    // the only copy of their points in a snapshot.
    var prev: Option[Set[String]] =
      if (a == 0L) scala.None
      else resolvableAtOrBelow(fs, tableDir, a).map(_.files.toSet)
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
              out += (v -> snap.files) // initial snapshot: full, unfiltered
            case Some(pf) =>
              // Rewrites carry no new points. The commit's own `rewrites`
              // record is authoritative (Delta's dataChange=false shape);
              // the name-prefix heuristic covers only manifests written
              // before the field existed.
              val isRewrite: String => Boolean =
                TableManifest.rewritesAt(fs, tableDir, v) match {
                  case Some(declared) => declared.contains _
                  case scala.None => isCompacted _
                }
              val added = snap.files.filterNot(pf).filterNot(isRewrite)
              if (added.nonEmpty) out += (v -> added)
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

private final class SegmentStreamTable(tableSchema: StructType, tableDir: String,
    maxVersionsPerTrigger: Option[Long])
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
          new SegmentMicroBatchStream(tableSchema, tableDir,
            maxVersionsPerTrigger)
      }
    }
}

/** One offset = one manifest version; everything at or below it has been
  * delivered.
  */
private final case class SegmentVersionOffset(version: Long) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

private final class SegmentMicroBatchStream(schema: StructType, tableDir: String,
    maxVersionsPerTrigger: Option[Long] = scala.None)
    extends MicroBatchStream
    with SupportsAdmissionControl with SupportsTriggerAvailableNow {
  // Driver-side construction: capture the session's Hadoop conf for the
  // executors (custom serializable wrapper — no Spark-private helpers).
  private val conf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  @transient private lazy val fs: FileSystem =
    new Path(tableDir).getFileSystem(conf.value)

  // Highest offset this run has already planned past (restored checkpoint
  // offsets, committed batch ends): the end-offset probe starts here, so
  // per-trigger cost is O(versions committed since the last trigger). A
  // floor of 0 (fresh run before any offset is seen) only costs one probe
  // from the oldest surviving version — correctness never depends on it.
  @volatile private var floor: Long = 0L
  private def raiseFloor(v: Long): Unit = if (v > floor) floor = v

  override def initialOffset(): Offset = SegmentVersionOffset(0L)

  /** End offsets advance only through versions whose snapshot RESOLVES: a
    * claimed-but-unreadable manifest is an in-flight commit that may still
    * complete, and committing an offset past it would make the next
    * trigger's anchor swallow its files undelivered (see
    * [[SegmentStream.latestDeliverable]] for the torn-claim fence and the
    * crashed-writer grace policy).
    */
  private def fencedHead(): Long =
    SegmentStream.latestDeliverable(fs, tableDir, floor,
      TableManifest.headVersion(fs, tableDir).getOrElse(0L),
      SegmentStream.TornClaimGraceMs, System.currentTimeMillis())

  // Trigger.AvailableNow contract: the drain target is snapshotted here,
  // and latestOffset never advances past it — the query then processes
  // (start, target] as one or several bounded batches and terminates.
  @volatile private var availableNowTarget: Option[Long] = scala.None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(fencedHead())

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-control end offset: the fenced head, capped at
    * `start + maxVersionsPerTrigger` versions (backlog catch-up runs as
    * several bounded micro-batches) and at the AvailableNow drain target.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[SegmentVersionOffset].version
    raiseFloor(from)
    val head = fencedHead()
    val capped = maxVersionsPerTrigger.fold(head)(k =>
      math.min(head, from + math.max(1L, k)))
    SegmentVersionOffset(
      availableNowTarget.fold(capped)(t => math.min(capped, t)))
  }

  override def latestOffset(): Offset = SegmentVersionOffset(
    availableNowTarget.fold(fencedHead())(t => math.min(fencedHead(), t)))

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val a = start.asInstanceOf[SegmentVersionOffset].version
    val b = end.asInstanceOf[SegmentVersionOffset].version
    raiseFloor(a)
    SegmentStream.addsBetween(fs, tableDir, a, b)
      .map(rel => SegmentFilePartition(rel): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SegmentFileReaderFactory(schema, tableDir, conf)

  override def deserializeOffset(json: String): Offset = {
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    val versionNode = if (node == null) null else node.get("version")
    if (versionNode == null || !versionNode.canConvertToLong)
      throw new IllegalStateException(
        s"Checkpointed offset '$json' for $tableDir was not written by the " +
          "manifest-offset segment stream (it looks like a pre-manifest " +
          "directory file-source checkpoint, which is incompatible). " +
          "Restart the stream from a fresh checkpoint location.")
    val v = versionNode.asLong()
    raiseFloor(v)
    SegmentVersionOffset(v)
  }

  override def commit(end: Offset): Unit =
    raiseFloor(end.asInstanceOf[SegmentVersionOffset].version)
  override def stop(): Unit = ()
}

private final case class SegmentFilePartition(rel: String) extends InputPartition

/** Per-JVM file-read-path counters: observability for the
  * vectorized-vs-fallback split (and the test hook proving the fast path
  * actually engages on engine-written files — a silent 100% fallback
  * would still be correct, just slow).
  */
private[graft] object SegmentStreamReadStats {
  val vectorizedFileReads = new java.util.concurrent.atomic.AtomicLong
  val fallbackFileReads = new java.util.concurrent.atomic.AtomicLong
}

/** Reads one committed segment file, deriving the directory-partition
  * `field_column` from the path. A missing file is an empty read — the
  * `ignoreMissingFiles` contract for a stream racing TRUNCATE's
  * quarantine.
  *
  * Fast path: Spark's vectorized parquet reader decoding into columnar
  * batches served row-by-row (the same decoder the batch scan uses —
  * matters most for a fresh consumer whose first micro-batch anchors on a
  * large table's full snapshot). Files written by this engine store the
  * read schema's columns in order; anything else (or any vectorized init
  * failure) falls back to the parquet-mr row reader, which handles any
  * column order.
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
    if (!fs.exists(path)) emptyReader
    else {
      try {
        val r = vectorizedReader(path, fieldColumn)
        SegmentStreamReadStats.vectorizedFileReads.incrementAndGet()
        r
      } catch {
        case _: Exception =>
          SegmentStreamReadStats.fallbackFileReads.incrementAndGet()
          rowReader(path, fieldColumn)
      }
    }
  }

  private def emptyReader: PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      override def next(): Boolean = false
      override def get(): InternalRow = null
      override def close(): Unit = ()
    }

  private def vectorizedReader(
      path: Path, fieldColumn: Int): PartitionReader[InternalRow] = {
    import scala.jdk.CollectionConverters._
    val fileFields = schema.fields.filter(_.name != SegmentSchema.FieldColumn)
    // The vectorized reader appends partition columns AFTER the file
    // columns, so the produced row layout is only correct when the file
    // stores exactly `fileFields` in schema order (field_column is last in
    // the read schema). Check the footer before committing to the fast
    // path; self-describing mismatch falls back to the order-aware reader.
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf.value))
    val fileColumns =
      try footer.getFileMetaData.getSchema.getFields.asScala.toSeq
        .map(f => (f.getName,
          if (f.isPrimitive) f.asPrimitiveType().getPrimitiveTypeName.name
          else "GROUP"))
      finally footer.close()
    // Names AND physical types must match: a file written externally with
    // the right column names but, say, DOUBLE where the schema says FLOAT
    // would pass a name-only gate and then fail (or mis-decode) mid-batch,
    // past the construction-time fallback below.
    val expected = fileFields.map(f => (f.name, f.dataType match {
      case ByteType | IntegerType => "INT32"
      case LongType => "INT64"
      case FloatType => "FLOAT"
      case BinaryType | StringType => "BINARY"
      case other => s"UNSUPPORTED($other)"
    })).toSeq
    require(fileColumns == expected,
      s"file columns $fileColumns differ from the read schema $expected")
    val reader =
      new org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader(
        /* useOffHeap = */ false, /* capacity = */ 4096)
    try {
      reader.initialize(path.toString, fileFields.map(_.name).toList.asJava)
      reader.initBatch(
        StructType(Seq(StructField(SegmentSchema.FieldColumn, IntegerType,
          nullable = false))),
        new GenericInternalRow(Array[Any](fieldColumn)))
    } catch { case e: Exception => reader.close(); throw e }
    new PartitionReader[InternalRow] {
      override def next(): Boolean = reader.nextKeyValue()
      override def get(): InternalRow =
        reader.getCurrentValue.asInstanceOf[InternalRow]
      override def close(): Unit = reader.close()
    }
  }

  private def rowReader(
      path: Path, fieldColumn: Int): PartitionReader[InternalRow] = {
    import scala.jdk.CollectionConverters._
    // The file's physical column types, so numeric decode can adapt: an
    // externally-written file with, say, DOUBLE where the schema says
    // FLOAT (or INT64 where it says INT32) still delivers through this
    // fallback instead of throwing a group-getter cast error.
    val footer = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf.value))
    val physical: Map[String, String] =
      try footer.getFileMetaData.getSchema.getFields.asScala
        .filter(_.isPrimitive)
        .map(f => f.getName -> f.asPrimitiveType().getPrimitiveTypeName.name)
        .toMap
      finally footer.close()
    val reader = ParquetReader.builder(new GroupReadSupport(), path)
      .withConf(conf.value).build()

    new PartitionReader[InternalRow] {
      private def integral(g: org.apache.parquet.example.data.Group,
                           name: String): Long = physical.getOrElse(name, "INT64") match {
        case "INT32" => g.getInteger(name, 0).toLong
        case "INT64" => g.getLong(name, 0)
        case other => throw new IllegalStateException(
          s"Column $name: cannot read physical $other as an integral type.")
      }
      private def floating(g: org.apache.parquet.example.data.Group,
                           name: String): Float = physical.getOrElse(name, "FLOAT") match {
        case "FLOAT" => g.getFloat(name, 0)
        case "DOUBLE" => g.getDouble(name, 0).toFloat
        case "INT32" => g.getInteger(name, 0).toFloat
        case "INT64" => g.getLong(name, 0).toFloat
        case other => throw new IllegalStateException(
          s"Column $name: cannot read physical $other as a float.")
      }
      private var current: InternalRow = _
      override def next(): Boolean = {
        val g = reader.read()
        if (g == null) { current = null; false }
        else {
          val values = schema.fields.map { f =>
            if (f.name == SegmentSchema.FieldColumn) fieldColumn
            else f.dataType match {
              case ByteType => integral(g, f.name).toByte
              case IntegerType => integral(g, f.name).toInt
              case LongType => integral(g, f.name)
              case FloatType => floating(g, f.name)
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
      override def close(): Unit = reader.close()
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
