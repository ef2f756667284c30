package graft.sources.mq

import java.io.File
import java.nio.file.Files
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Message-queue-shaped streaming source: the reference's SQS long-poll
  * loop (S1, `/root/reference/src/kalytical/core/mq_poller.py:16-30`)
  * as a first-class DataSource V2 `MicroBatchStream`, with the SAME
  * row schema as Spark's Kafka source (key/value/topic/partition/
  * offset/timestamp/timestampType) — so a pipeline written against it
  * swaps to a real Kafka topic by changing only the `format()` string.
  *
  * Queue model: a spool directory; ONE FILE = ONE MESSAGE (the SQS
  * body), ordered by filename. The stream offset is the count of
  * messages consumed, checkpointed by the engine — replacing the
  * receive/delete dance of `mq_poller.py:20-30` (whose committed code
  * deletes at most one message per poll even on failure) with exact
  * at-least-once replay from checkpointed offsets. `commit` is
  * non-destructive: consumed files stay for replay/audit (an SQS-style
  * destructive ack would unlink files here). OPERATOR CONTRACT (r12
  * review): because offsets are listing POSITIONS, spool files must
  * NOT be removed while a checkpoint is live — removal shifts the
  * offset→message mapping for everything after the gap; the
  * detectable case (listing shorter than the checkpointed offset)
  * fails the trigger loudly, and archival/cleanup belongs AFTER a
  * checkpoint reset.
  *
  * Scale: the per-batch driver work is one directory listing (the same
  * cost class as Spark's own file source); message payloads are read
  * ONLY inside executor-side partition readers, partitioned evenly
  * across the batch's message range.
  */
object SpoolMQ {
  /** Kafka source schema, field for field. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Stable message order: filename sort (producers write
    * monotonically-named files — ULIDs, sequence numbers, ...).
    *
    * A directory that EXISTS but fails to list (transient I/O error,
    * NFS blip — `listFiles` returns null for both) FAILS LOUDLY
    * instead of reading as an empty queue (r10 review: the empty-queue
    * reading rewound latestOffset to 0, and when the mount recovered
    * the whole spool replayed — duplicate redelivery after a blip that
    * should simply have failed the trigger). A NOT-YET-CREATED spool
    * dir is still an empty queue (the pre-producer grace). */
  def listMessages(dir: String): Array[File] = {
    val d = new File(dir)
    Option(d.listFiles()) match {
      case Some(fs) =>
        fs.filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
          .sortBy(_.getName)
      case None if !d.exists() => Array.empty
      case None =>
        throw new java.io.IOException(
          s"spool dir $dir exists but cannot be listed - failing the trigger " +
            "rather than reading it as an empty queue (offset rewind)")
    }
  }
}

class SpoolMQProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "spool-mq"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SpoolMQ.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("spool-mq requires a path (use .load(dir))"))
    new SpoolMQTable(path)
  }
}

final class SpoolMQTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"spool-mq:$path"
  override def schema(): StructType = SpoolMQ.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val cap = Option(options.get("maxPerTrigger")).map(_.toLong).getOrElse(100000L)
    new ScanBuilder {
      override def build(): Scan = new SpoolMQScan(path, cap)
    }
  }
}

final class SpoolMQScan(path: String, maxPerTrigger: Long = 100000L) extends Scan {
  override def readSchema(): StructType = SpoolMQ.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SpoolMQStream(path, maxPerTrigger)
  /** Batch mode reads the whole spool — handy for backfills/tests. */
  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] =
      SpoolMQStream.partitions(path, 0L, SpoolMQ.listMessages(path).length.toLong)
    override def createReaderFactory(): PartitionReaderFactory = new SpoolMQReaderFactory
  }
}

/** Long offset = number of messages consumed from the spool. */
final case class SpoolOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

object SpoolMQStream {
  /** Slice the [start, end) message range into ≤8 even partitions, each
    * carrying only (path, offset) pairs — payload bytes stay on the
    * executors. Lists fresh; the stream path passes its per-trigger
    * cached listing to [[partitionsOf]] instead. */
  def partitions(dir: String, start: Long, end: Long): Array[InputPartition] =
    partitionsOf(dir, SpoolMQ.listMessages(dir), start, end)

  /** Core slicer over an already-obtained listing. Offsets are LISTING
    * POSITIONS, so a listing SHORTER than the checkpointed start means
    * consumed files were removed — the mapping from offset to message
    * has shifted for everything after the gap, and silently slicing
    * would re-deliver retained-but-consumed messages as new and/or
    * never read fresh ones (r12 review). Detectable shrink fails
    * loudly; the operator contract (class doc) forbids removing spool
    * files under a live checkpoint. Bounds are clamped in Long BEFORE
    * the Int conversion — a JVM array index always fits once clamped
    * to [0, files.length], so the old `start.toInt` wrap past 2^31 is
    * impossible by construction. */
  def partitionsOf(dir: String, files: Array[File], start: Long,
                   end: Long): Array[InputPartition] = {
    val all = files.length.toLong
    if (start > all)
      throw new IllegalStateException(
        s"spool listing has $all messages but the checkpoint says $start were " +
          "consumed - spool files were removed under a live checkpoint, which " +
          "remaps offset->message; restore them or reset the checkpoint")
    val s = math.max(0L, start).toInt
    val e = math.max(s.toLong, math.min(end, all)).toInt
    val range = files.zipWithIndex
      .slice(s, e)
      .map { case (f, i) => (f.getAbsolutePath, i.toLong, f.lastModified()) }
    if (range.isEmpty) Array.empty
    else {
      val nSplits = math.min(8, range.length)
      range.grouped((range.length + nSplits - 1) / nSplits)
        .map(chunk => SpoolMQPartition(new File(dir).getName, chunk.toArray): InputPartition)
        .toArray
    }
  }
}

final case class SpoolMQPartition(topic: String, msgs: Array[(String, Long, Long)])
    extends InputPartition

/** `maxPerTrigger` caps how much of a BACKLOG one micro-batch admits
  * (r10 review: a plain MicroBatchStream silently ignores
  * maxOffsetsPerTrigger-style limits, so the first trigger after a
  * weekend outage read the ENTIRE spool in one batch — no incremental
  * checkpointing, executor-OOM-sized partitions). Spark drives the cap
  * through SupportsAdmissionControl; the checkpointed end offset
  * advances by at most the cap per trigger and the rest of the backlog
  * drains over subsequent batches. */
final class SpoolMQStream(path: String, protected val maxPerTrigger: Long = 100000L)
    extends MQAdmissionControl {
  // ONE listing per trigger (r12 review: reportLatestOffset, the
  // latestOffset tail probe and planInputPartitions each re-listed and
  // re-sorted the whole spool — three O(N log N) driver passes per
  // batch on a directory the non-destructive ack only ever GROWS).
  // tailNow() refreshes the cache; planInputPartitions reuses it when
  // it covers the batch range and re-lists otherwise (safety, not the
  // common path).
  @volatile private var cachedListing: Array[File] = Array.empty
  protected def tailNow(): Long = {
    val fs = SpoolMQ.listMessages(path)
    cachedListing = fs
    fs.length.toLong
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (a, b) = (start.asInstanceOf[SpoolOffset].n, end.asInstanceOf[SpoolOffset].n)
    val fs = { val c = cachedListing; if (c.length >= b) c else SpoolMQ.listMessages(path) }
    SpoolMQStream.partitionsOf(path, fs, a, b)
  }
  override def createReaderFactory(): PartitionReaderFactory = new SpoolMQReaderFactory
}

final class SpoolMQReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SpoolMQPartition]
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < p.msgs.length }
      override def get(): InternalRow = {
        val (file, offset, mtimeMs) = p.msgs(i)
        val body = Files.readAllBytes(new File(file).toPath)
        InternalRow(
          null,                              // key: spool messages are unkeyed
          body,                              // value = message body bytes
          UTF8String.fromString(p.topic),    // topic = spool dir name
          0,                                 // single logical partition
          offset,
          mtimeMs * 1000L,                   // micros since epoch
          1)                                 // LOG_APPEND_TIME analog
      }
      override def close(): Unit = ()
    }
  }
}
