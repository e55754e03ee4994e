package graft.sources

import java.util

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import graft.model.NginxLog

/** DataSource V2 connector for raw nginx JSON-lines logs
  * (`spark.read.format("graft.sources.NginxLogSource").load(dir)`).
  *
  * Why a custom source instead of `spark.read.json`: the generic JSON
  * reader materializes every field of every record before Catalyst can
  * prune. This source receives the required columns and pushable
  * filters from Catalyst (SupportsPushDownRequiredColumns /
  * SupportsPushDownFilters) and applies both *inside* the per-partition
  * reader — only requested fields are extracted from each JSON object,
  * and records failing pushed equality/not-null filters are dropped
  * before an InternalRow is built. At 100 TB of 38-field log lines,
  * parsing 3 fields instead of 38 is the scan bottleneck.
  *
  * Scope: batch read; files are split into ~`splitSize`-byte input
  * partitions (default 128 MB, a read option) using the standard
  * line-oriented split protocol (see [[NginxLogReader]]) — a single
  * 10 GB log file fans out to ~80 tasks instead of one. Malformed
  * lines are skipped — the producer-side validity gate (reference:
  * producer/main.py:76-77).
  *
  * Registered as `format("nginxlog")` via
  * META-INF/services/org.apache.spark.sql.sources.DataSourceRegister.
  */
class NginxLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "nginxlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NginxLog.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty,
      "graft.sources.NginxLogSource requires a path: .load(<dir-or-file>)")
    // honor a user-supplied schema (supportsExternalMetadata): any
    // subset/ordering of STRING fields extracted by name — the reader
    // emits UTF8String cells, so non-string types must be rejected here
    // rather than corrupt rows downstream
    val effective = Option(schema).getOrElse(NginxLog.schema)
    val nonString = effective.fields.filterNot(
      _.dataType == org.apache.spark.sql.types.StringType)
    require(nonString.isEmpty,
      s"NginxLogSource reads string fields only; cast after load. Offending: " +
        nonString.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", "))
    new NginxLogTable(path, effective)
  }
  override def supportsExternalMetadata(): Boolean = true
}

class NginxLogTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"nginxlog:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NginxLogScanBuilder(path, tableSchema,
      options.getLong("splitSize", 128L * 1024 * 1024))
}

class NginxLogScanBuilder(path: String, tableSchema: StructType,
    splitSize: Long) extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // fully handle string equality and not-null on top-level fields;
    // everything else stays a Spark-side residual
    val (handled, residual) = filters.partition {
      case EqualTo(_, _: String) => true
      case IsNotNull(_) => true
      case _ => false
    }
    pushed = handled
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new NginxLogScan(path, required, pushed, splitSize)
}

class NginxLogScan(path: String, required: StructType, pushed: Array[Filter],
    splitSize: Long) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"NginxLogScan path=$path, fields=[${required.fieldNames.mkString(",")}], " +
      s"pushedFilters=[${pushed.mkString(",")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    // hadoop FileSystem listing: works for file:// and any configured
    // scheme reachable with the session hadoop conf on the driver
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(st => st.isFile &&
          !st.getPath.getName.startsWith(".") &&
          !st.getPath.getName.startsWith("_"))
          .map(st => st.getPath.toString -> st.getLen)
      else Array(path -> fs.getFileStatus(p).getLen)
    // chop each file into ~splitSize byte ranges; ranges are aligned to
    // line boundaries at read time by the split protocol in the reader,
    // so the cut points here can be arbitrary
    files.sortBy(_._1).flatMap { case (f, len) =>
      if (len <= splitSize) Array(NginxLogPartition(f, 0L, len))
      else {
        val n = math.ceil(len.toDouble / splitSize).toInt
        Array.tabulate(n) { i =>
          val start = i.toLong * splitSize
          NginxLogPartition(f, start, math.min(splitSize, len - start))
        }
      }
    }.map(p => p: InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the session hadoop conf to executors as plain entries —
    // Configuration itself is not serializable and the reader would
    // otherwise open s3a/hdfs paths without credentials/defaults
    import scala.jdk.CollectionConverters._
    val confMap = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration.asScala
      .map(e => e.getKey -> e.getValue).toMap
    new NginxLogReaderFactory(required.fieldNames, pushed, confMap)
  }
}

case class NginxLogPartition(file: String, start: Long, length: Long)
    extends InputPartition

class NginxLogReaderFactory(fields: Array[String], pushed: Array[Filter],
    confMap: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new NginxLogReader(partition.asInstanceOf[NginxLogPartition], fields,
      pushed, confMap)
}

/** Reads one byte range of one JSON-lines file.
  *
  * Split protocol (the TextInputFormat convention, so arbitrary byte
  * cut points never split or duplicate a record): a split owns every
  * line that STARTS at an offset in (start, start+length] — plus
  * offset 0 for the first split. Concretely: a non-first split seeks
  * to `start` and discards everything up to the first newline (that
  * prefix belongs to the previous split's last line); it then reads
  * whole lines while their start offset is <= start+length, so its
  * final line may extend past the range end — which is exactly the
  * prefix the next split discards.
  */
class NginxLogReader(part: NginxLogPartition, fields: Array[String],
    pushed: Array[Filter],
    confMap: Map[String, String]) extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val fsPath = new org.apache.hadoop.fs.Path(part.file)
  private val hadoopConf = {
    val c = new org.apache.hadoop.conf.Configuration()
    confMap.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val stream = fsPath.getFileSystem(hadoopConf).open(fsPath)
  private val end = part.start + part.length
  /** Offset where the next line read will start. */
  private var pos = part.start
  private val lineReader = {
    if (part.start > 0) stream.seek(part.start)
    new org.apache.hadoop.util.LineReader(stream)
  }
  if (part.start > 0) pos += lineReader.readLine(new org.apache.hadoop.io.Text())
  private val text = new org.apache.hadoop.io.Text()
  private var row: InternalRow = _

  private def passes(get: String => String): Boolean =
    pushed.forall {
      case EqualTo(a, v: String) => get(a) == v
      case IsNotNull(a) => get(a) != null
      case _ => true
    }

  override def next(): Boolean = {
    while (pos <= end) {
      val n = lineReader.readLine(text)
      if (n == 0) return false // EOF
      pos += n
      try {
        val node = mapper.readTree(text.toString)
        if (node != null && node.isObject) {
          def get(f: String): String = {
            val v = node.get(f)
            if (v == null || v.isNull) null else v.asText()
          }
          if (passes(get)) {
            val values = new Array[Any](fields.length)
            var i = 0
            while (i < fields.length) {
              val s = get(fields(i))
              values(i) = if (s == null) null else UTF8String.fromString(s)
              i += 1
            }
            row = new GenericInternalRow(values)
            return true
          }
        }
      } catch { case _: Exception => () } // malformed line → skip
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = lineReader.close()
}
