package graft.sources

import java.util.concurrent.ConcurrentSkipListMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Keyed-store table sink + scan (SURVEY 2.2): the HBase table sink /
  * scan analog for an environment with no HBase. The reference writes
  * rows as keyed puts (`be/src/exec/hbase-table-sink.h:33`, cells keyed
  * by row key) and scans them back with start/stop row-key ranges
  * (`be/src/exec/hbase-scan-node.h`); this connector mirrors both
  * contracts against a sorted in-process KV store:
  *
  *  - WRITE: each task writes (key -> row) puts directly to the store.
  *    Puts are idempotent by key, so speculative or retried tasks are
  *    safe without a commit protocol — exactly HBase's model (last
  *    write per key wins; no atomic multi-row commit exists there
  *    either).
  *  - READ: range/equality conjuncts on `key` become start/stop bounds
  *    of a sorted sub-map scan (the accepted-conjuncts contract, like
  *    KvRangeSource); everything else is residual.
  *
  * The store itself is a JVM-wide ConcurrentSkipListMap standing in for
  * the network KV client — the connector code (writer factories,
  * per-task buffering, pushdown bounds) is the real Spark plumbing that
  * would wrap an HBase client at scale.
  *
  * Usage:
  *   df.write.format("graft.sources.KvStoreSink").option("table","t")
  *     .mode("append").save()
  *   spark.read.format("graft.sources.KvStoreSink").option("table","t").load()
  */
class KvStoreSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvStore.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new KvStoreTable(
      Option(properties.get("table")).getOrElse("default"))
}

object KvStore {
  val schema: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("val", DoubleType, nullable = false),
    StructField("tag", StringType, nullable = true)))

  final case class Cell(v: Double, tag: String)

  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, ConcurrentSkipListMap[Long, Cell]]()

  def table(name: String): ConcurrentSkipListMap[Long, Cell] =
    tables.computeIfAbsent(name, _ => new ConcurrentSkipListMap[Long, Cell]())

  def drop(name: String): Unit = tables.remove(name)
}

class KvStoreTable(tableName: String) extends Table
    with SupportsRead with SupportsWrite {

  override def name(): String = s"kv_store($tableName)"
  override def schema(): StructType = KvStore.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvStoreScanBuilder(tableName)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new KvStoreBatchWrite(
          tableName, info.schema(), doTruncate)
      }
    }
}

class KvStoreBatchWrite(tableName: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo)
      : DataWriterFactory = {
    if (truncate) KvStore.table(tableName).clear()
    new KvStoreWriterFactory(tableName, schema)
  }

  // puts are applied by the tasks themselves (idempotent by key — the
  // HBase model); commit/abort carry no state
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class KvStoreWriterFactory(tableName: String, schema: StructType)
    extends DataWriterFactory {

  private val keyIdx = schema.fieldIndex("key")
  private val valIdx = schema.fieldIndex("val")
  private val tagIdx = schema.fieldIndex("tag")

  override def createWriter(partitionId: Int, taskId: Long)
      : DataWriter[InternalRow] = new DataWriter[InternalRow] {
    private val store = KvStore.table(tableName)
    override def write(row: InternalRow): Unit =
      store.put(row.getLong(keyIdx), KvStore.Cell(
        row.getDouble(valIdx),
        if (row.isNullAt(tagIdx)) null else row.getUTF8String(tagIdx).toString))
    override def commit(): WriterCommitMessage =
      new WriterCommitMessage {}
    override def abort(): Unit = ()
    override def close(): Unit = ()
  }
}

class KvStoreScanBuilder(tableName: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var lo = Long.MinValue
  private var hi = Long.MaxValue // inclusive bounds
  private var accepted = Array.empty[Filter]
  private var required = KvStore.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition {
      case GreaterThan("key", _: Long) => true
      case GreaterThanOrEqual("key", _: Long) => true
      case LessThan("key", _: Long) => true
      case LessThanOrEqual("key", _: Long) => true
      case EqualTo("key", _: Long) => true
      case _ => false
    }
    ok.foreach {
      case GreaterThan("key", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("key", v: Long) => lo = math.max(lo, v)
      case LessThan("key", v: Long) => hi = math.min(hi, v - 1)
      case LessThanOrEqual("key", v: Long) => hi = math.min(hi, v)
      case EqualTo("key", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      case _ => ()
    }
    accepted = ok
    residual
  }

  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new KvStoreScan(tableName, lo, hi, required)
}

class KvStoreScan(tableName: String, lo: Long, hi: Long,
    required: StructType) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"KvStoreScan table=$tableName range=[$lo, $hi] " +
      s"columns=${required.fieldNames.mkString(",")}"

  /** One partition per contiguous key sub-range (4 splits like the
    * reference's region-per-scan-range parallelism).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val store = KvStore.table(tableName)
    if (store.isEmpty) return Array.empty
    val from = math.max(lo, store.firstKey())
    val to = math.min(hi, store.lastKey())
    if (from > to) return Array.empty
    val span = to - from + 1
    val splits = 4
    val step = math.max(1L, span / splits)
    Iterator.iterate(from)(_ + step).takeWhile(_ <= to).map { s =>
      KvStorePartition(tableName, s, math.min(to, s + step - 1)): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KvStoreReaderFactory(required)
}

case class KvStorePartition(tableName: String, lo: Long, hi: Long)
    extends InputPartition

class KvStoreReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[KvStorePartition]
    val it = KvStore.table(part.tableName)
      .subMap(part.lo, true, part.hi, true).entrySet().iterator().asScala
    new PartitionReader[InternalRow] {
      private var cur: (Long, KvStore.Cell) = _
      override def next(): Boolean = {
        if (!it.hasNext) return false
        val e = it.next(); cur = (e.getKey, e.getValue); true
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(required.fieldNames.toSeq.map {
          case "key" => cur._1
          case "val" => cur._2.v
          case "tag" =>
            if (cur._2.tag == null) null else UTF8String.fromString(cur._2.tag)
        })
      override def close(): Unit = ()
    }
  }
}
