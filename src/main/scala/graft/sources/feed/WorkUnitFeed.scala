package graft.sources.feed

import java.util.concurrent.ConcurrentLinkedQueue

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Work-unit-feed source — the Spark-native analog of the reference's
  * driver-fed scan machinery (`/root/reference/src/work_unit_feed/`,
  * `work_unit_feed.rs:125-180`, `work_unit_feed_provider.rs:24-96`):
  * units of work (here: file addresses) that cannot be known at planning
  * time are produced by a DRIVER-side provider at execution time and fanned
  * out to workers.
  *
  * Mapping onto Spark's execution model:
  *  - reference `WorkUnitFeedProvider.feed` (coordinator-only) →
  *    [[WorkUnitFeedRegistry]] drained inside `Batch.planInputPartitions`,
  *    which Spark guarantees runs on the driver;
  *  - reference's coordinator→worker gRPC streaming of units →
  *    Spark's serialization of each [[CsvWorkUnit]] `InputPartition` to the
  *    executor that processes it;
  *  - reference `RemoteWorkUnitFeed` on workers → the executor-side
  *    [[CsvWorkUnitReader]] that materializes the unit's rows.
  *
  * Usage:
  * {{{
  *   WorkUnitFeedRegistry.register("my-feed", () => paths.map(CsvWorkUnit(_, header = true)))
  *   spark.read.format("graft.sources.feed.WorkUnitFeedTableProvider")
  *     .option("feed.id", "my-feed")
  *     .option("schema", "a BIGINT, b STRING")
  *     .load()
  * }}}
  */
object WorkUnitFeedRegistry {
  private val feeds = TrieMap.empty[String, () => Seq[WorkUnit]]

  /** Driver-side: register the provider closure for a feed id. The closure
    * runs once per query execution, at `planInputPartitions` time.
    */
  def register(id: String, provider: () => Seq[WorkUnit]): Unit =
    feeds.put(id, provider)

  def provide(id: String): Seq[WorkUnit] =
    feeds.getOrElse(id,
      throw new IllegalStateException(s"no work-unit feed registered as '$id'"))()

  def unregister(id: String): Unit = feeds.remove(id)
}

/** One unit of work, serializable — Spark ships it to whichever executor
  * claims the partition; the unit knows how to open its own reader there.
  *
  * Locality: the reference routes work units to specific workers
  * (`src/events/route_tasks.rs`; custom-leaf routing in
  * `docs/source/user-guide/04-distribute-custom-plan.md:26-217`). Spark's
  * analog is [[InputPartition.preferredLocations]], which the DAGScheduler
  * consults when placing the task. A unit can pin hosts explicitly
  * (`preferredHosts` — the reference's explicit-routing case) or, when the
  * unit is a file, fall back to the filesystem's block hosts (the
  * HDFS-locality case). Both are hints: Spark still runs the task anywhere
  * if the preferred host has no free slot — same best-effort contract as
  * the reference's router.
  */
sealed trait WorkUnit extends InputPartition {
  def reader(schema: StructType): PartitionReader[InternalRow]

  /** Explicit routing hints; overrides file-block locality when non-empty. */
  def preferredHosts: Seq[String] = Nil

  /** The file behind this unit, if any — used for block-locality lookup. */
  def path: String

  // Resolved once per unit on the DRIVER (preferredLocations is only called
  // by the scheduler there); @transient so the resolution never ships.
  @transient private lazy val resolvedLocations: Array[String] =
    if (preferredHosts.nonEmpty) preferredHosts.toArray
    else WorkUnitLocality.blockHosts(path)

  override def preferredLocations(): Array[String] = resolvedLocations
}

/** Driver-side block-host lookup via the Hadoop FileSystem API — works for
  * HDFS (real block hosts), local files ("localhost"), and object stores
  * (no hosts → empty, meaning "anywhere", which is correct: S3 has no
  * locality). Failures degrade to no preference rather than failing the
  * scan: locality is an optimization, never a correctness constraint.
  */
private[feed] object WorkUnitLocality {
  def blockHosts(path: String): Array[String] =
    try {
      // Active session's Hadoop conf when present (never CREATES a context
      // — this runs on the scheduler path); plain defaults otherwise.
      val conf = org.apache.spark.sql.SparkSession.getActiveSession
        .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        .map(_.sparkContext.hadoopConfiguration)
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(conf)
      val status = fs.getFileStatus(p)
      fs.getFileBlockLocations(status, 0L, status.getLen)
        .flatMap(_.getHosts).distinct
    } catch { case _: Exception => Array.empty[String] }
}

/** A CSV file (or a single split of one). */
case class CsvWorkUnit(path: String, header: Boolean,
                       override val preferredHosts: Seq[String] = Nil)
    extends WorkUnit {
  override def reader(schema: StructType): PartitionReader[InternalRow] =
    new CsvWorkUnitReader(this, schema)
}

/** An Avro object-container file — the reference's optional Avro source
  * (`/root/reference/Cargo.toml` avro feature). The spark-avro connector
  * is not bundled in this image, so the executor-side read uses the Avro
  * core reader directly (same jars Spark itself ships).
  */
case class AvroWorkUnit(path: String,
                        override val preferredHosts: Seq[String] = Nil)
    extends WorkUnit {
  override def reader(schema: StructType): PartitionReader[InternalRow] =
    new AvroWorkUnitReader(this, schema)
}

/** Runtime (mid-query) work discovery — the reference's defining feed
  * behavior that the batch path above cannot express: its coordinator
  * STREAMS units to a running query with per-partition backpressure
  * (`/root/reference/src/work_unit_feed/work_unit_feed.rs:125-180`;
  * chunked dispatch in `src/coordinator/query_coordinator.rs:38-41`), so
  * work discovered after execution starts still reaches the running
  * query's result. Spark's batch DSv2 fixes the partition list at
  * `planInputPartitions` — once planned, late units are invisible. The
  * micro-batch streaming path below lifts that: each trigger drains the
  * units offered since the previous trigger, so a unit offered while the
  * query is RUNNING joins a later micro-batch of the same query.
  *
  * Backpressure: the reference dispatches units in bounded chunks per
  * worker; the analog here is `feed.maxUnitsPerBatch`, an admission cap on
  * units per micro-batch — Spark's trigger loop then naturally paces
  * intake to processing speed (a slow sink delays the next trigger, which
  * delays the next drain), the same effect as the reference's bounded
  * channel.
  *
  * Feeds are per-query-run transients (exactly the reference's feed
  * lifetime, coordinator-scoped): offsets index an in-memory driver
  * buffer, so a checkpoint-restarted query re-reads from whatever the
  * feed currently holds rather than recovering history.
  */
object DynamicWorkUnitFeed {
  final class Feed {
    private[feed] val queue = new ConcurrentLinkedQueue[WorkUnit]()
    @volatile private[feed] var closed = false
    def offer(units: Seq[WorkUnit]): Unit = {
      require(!closed, "cannot offer units to a closed feed")
      units.foreach(queue.add)
    }
    def close(): Unit = closed = true
  }
  private val feeds = TrieMap.empty[String, Feed]

  def create(id: String): Feed = {
    val f = new Feed
    feeds.put(id, f)
    f
  }
  def get(id: String): Feed = feeds.getOrElse(id,
    throw new IllegalStateException(s"no dynamic work-unit feed '$id'"))
  def remove(id: String): Unit = feeds.remove(id)
}

private[feed] case class FeedOffset(n: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = n.toString
}

/** Driver-side micro-batch stream over a [[DynamicWorkUnitFeed]]: offsets
  * count units admitted so far; `latestOffset` drains newly-offered units
  * into a monotonic buffer and admits at most `maxUnitsPerBatch` beyond
  * the last planned end.
  */
private[feed] class WorkUnitFeedMicroBatchStream(
    feedId: String, schema: StructType, maxUnitsPerBatch: Int)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val buffer = scala.collection.mutable.ArrayBuffer.empty[WorkUnit]
  private var lastPlannedEnd = 0L

  private def drain(): Unit = {
    val q = DynamicWorkUnitFeed.get(feedId).queue
    var u = q.poll()
    while (u != null) { buffer += u; u = q.poll() }
  }

  override def initialOffset(): Offset = FeedOffset(0L)

  override def latestOffset(): Offset = synchronized {
    drain()
    val avail = buffer.size.toLong
    val cap = if (maxUnitsPerBatch > 0)
      math.min(avail, lastPlannedEnd + maxUnitsPerBatch) else avail
    FeedOffset(cap)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val (s, e) = (start.asInstanceOf[FeedOffset].n, end.asInstanceOf[FeedOffset].n)
      lastPlannedEnd = math.max(lastPlannedEnd, e)
      buffer.slice(s.toInt, e.toInt).toArray
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new CsvWorkUnitReaderFactory(schema)
  override def deserializeOffset(json: String): Offset = FeedOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class WorkUnitFeedTableProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val ddl = options.get("schema")
    require(ddl != null,
      "work-unit-feed source requires .option(\"schema\", \"<DDL>\") — " +
        "work units carry no self-describing schema")
    StructType.fromDDL(ddl)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val feedId = properties.get("feed.id")
    require(feedId != null,
      "work-unit-feed source requires .option(\"feed.id\", \"<registered id>\")")
    new WorkUnitFeedTable(schema, feedId)
  }

  override def supportsExternalMetadata(): Boolean = true
}

class WorkUnitFeedTable(schema: StructType, feedId: String)
    extends Table with SupportsRead {
  override def name(): String = s"work_unit_feed($feedId)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxUnitsPerBatch = options.getInt("feed.maxUnitsPerBatch", 0)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def toBatch: Batch = new Batch {
          // Driver-side: the provider is consulted HERE, at execution time —
          // work units need not exist at planning time.
          override def planInputPartitions(): Array[InputPartition] =
            WorkUnitFeedRegistry.provide(feedId).toArray
          override def createReaderFactory(): PartitionReaderFactory =
            new CsvWorkUnitReaderFactory(schema)
        }
        // Streaming path: `spark.readStream` against the same feed id
        // (registered via [[DynamicWorkUnitFeed]]) — units offered while
        // the query runs join later micro-batches; see
        // [[WorkUnitFeedMicroBatchStream]].
        override def toMicroBatchStream(checkpointLocation: String)
            : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
          new WorkUnitFeedMicroBatchStream(feedId, schema, maxUnitsPerBatch)
      }
    }
  }
}

class CsvWorkUnitReaderFactory(schema: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition.asInstanceOf[WorkUnit].reader(schema)
}

/** Executor-side: materializes one work unit. Parsing delegates to
  * univocity (the CSV parser Spark's own csv source uses, already on the
  * classpath), so RFC-4180 quoting — commas/quotes/newlines inside quoted
  * fields, exactly what Spark's writer emits for such values — round-trips
  * instead of failing or silently shifting columns.
  */
class CsvWorkUnitReader(unit: CsvWorkUnit, schema: StructType)
    extends PartitionReader[InternalRow] {
  import com.univocity.parsers.csv.{CsvParser, CsvParserSettings}

  private val in = new java.io.InputStreamReader(
    new java.io.FileInputStream(unit.path), java.nio.charset.StandardCharsets.UTF_8)
  private val parser = {
    val settings = new CsvParserSettings()
    settings.setHeaderExtractionEnabled(unit.header)
    // Match Spark's csv-read defaults: field content is taken verbatim.
    settings.setIgnoreLeadingWhitespaces(false)
    settings.setIgnoreTrailingWhitespaces(false)
    settings.setEmptyValue("")
    val p = new CsvParser(settings)
    p.beginParsing(in)
    p
  }
  private var current: InternalRow = _

  override def next(): Boolean = {
    val parts = parser.parseNext()
    if (parts == null) { false }
    else {
      val values = schema.fields.zipWithIndex.map { case (f, i) =>
        // Univocity yields null for absent/empty-unquoted fields (Spark's
        // csv source reads those as null too); short rows pad with null.
        val raw = if (i < parts.length) parts(i) else null
        if (raw == null || raw.isEmpty) null
        else f.dataType match {
          case LongType => java.lang.Long.valueOf(raw.toLong)
          case IntegerType => java.lang.Integer.valueOf(raw.toInt)
          case DoubleType => java.lang.Double.valueOf(raw.toDouble)
          case StringType => UTF8String.fromString(raw)
          case BooleanType => java.lang.Boolean.valueOf(raw.toBoolean)
          case other => throw new UnsupportedOperationException(
            s"CsvWorkUnitReader does not support $other")
        }
      }
      current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
      true
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = { parser.stopParsing(); in.close() }
}

/** Executor-side Avro container-file reader: Avro core `DataFileReader` +
  * per-field conversion into Spark internal types. Field order follows the
  * SPARK schema; fields are looked up in the record by name, so the Avro
  * writer's field order need not match.
  */
class AvroWorkUnitReader(unit: AvroWorkUnit, schema: StructType)
    extends PartitionReader[InternalRow] {
  import org.apache.avro.file.DataFileReader
  import org.apache.avro.generic.{GenericDatumReader, GenericRecord}

  private val reader = new DataFileReader[GenericRecord](
    new java.io.File(unit.path), new GenericDatumReader[GenericRecord]())
  // Fail loudly on a schema mismatch: GenericRecord.get(name) returns null
  // (not an error) for unknown fields, which would silently yield all-null
  // columns for a misspelled field name.
  locally {
    import scala.jdk.CollectionConverters._
    val avroNames: Set[String] = reader.getSchema.getFields.asScala.map(_.name()).toSet
    val missing: Seq[String] = schema.fields.map(_.name).toSeq.filterNot(avroNames.contains)
    require(missing.isEmpty,
      s"fields ${missing.mkString(", ")} not present in Avro file ${unit.path} " +
        s"(has: ${avroNames.mkString(", ")})")
  }
  private var current: InternalRow = _

  override def next(): Boolean = {
    if (!reader.hasNext) false
    else {
      val rec = reader.next()
      val values = schema.fields.map { f =>
        rec.get(f.name) match {
          case null => null
          case v => f.dataType match {
            case LongType => java.lang.Long.valueOf(v.asInstanceOf[java.lang.Number].longValue())
            case IntegerType => java.lang.Integer.valueOf(v.asInstanceOf[java.lang.Number].intValue())
            case DoubleType => java.lang.Double.valueOf(v.asInstanceOf[java.lang.Number].doubleValue())
            case StringType => UTF8String.fromString(v.toString)
            case BooleanType => java.lang.Boolean.valueOf(v.asInstanceOf[java.lang.Boolean])
            case other => throw new UnsupportedOperationException(
              s"AvroWorkUnitReader does not support $other")
          }
        }
      }
      current = new GenericInternalRow(values.asInstanceOf[Array[Any]])
      true
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
