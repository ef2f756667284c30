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
  * destructive ack would unlink files here).
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
    * monotonically-named files — ULIDs, sequence numbers, ...). */
  def listMessages(dir: String): Array[File] = {
    val d = new File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith(".") && !f.getName.startsWith("_"))
      .sortBy(_.getName)
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
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new SpoolMQScan(path)
    }
}

final class SpoolMQScan(path: String) extends Scan {
  override def readSchema(): StructType = SpoolMQ.schema
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new SpoolMQStream(path)
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
    * executors. */
  def partitions(dir: String, start: Long, end: Long): Array[InputPartition] = {
    val files = SpoolMQ.listMessages(dir)
    val range = files.zipWithIndex
      .slice(start.toInt, math.min(end, files.length.toLong).toInt)
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

final class SpoolMQStream(path: String) extends MicroBatchStream {
  override def initialOffset(): Offset = SpoolOffset(0L)
  override def latestOffset(): Offset = SpoolOffset(SpoolMQ.listMessages(path).length.toLong)
  override def deserializeOffset(json: String): Offset = SpoolOffset(json.toLong)
  /** Non-destructive ack — see class doc. */
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    SpoolMQStream.partitions(path,
      start.asInstanceOf[SpoolOffset].n, end.asInstanceOf[SpoolOffset].n)
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
