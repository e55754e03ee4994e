package graft.sources

import java.util

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, IsNotNull}
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
  * Scope: batch read, one input partition per file (a production
  * version would split by byte ranges). Malformed lines are skipped —
  * the producer-side validity gate (reference: producer/main.py:76-77).
  */
class NginxLogSource extends TableProvider {
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
    new NginxLogScanBuilder(path, tableSchema)
}

class NginxLogScanBuilder(path: String, tableSchema: StructType) extends ScanBuilder
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

  override def build(): Scan = new NginxLogScan(path, required, pushed)
}

class NginxLogScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
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
          .map(_.getPath.toString)
      else Array(path)
    files.sorted.map(f => NginxLogPartition(f): InputPartition)
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

case class NginxLogPartition(file: String) extends InputPartition

class NginxLogReaderFactory(fields: Array[String], pushed: Array[Filter],
    confMap: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new NginxLogReader(partition.asInstanceOf[NginxLogPartition].file, fields,
      pushed, confMap)
}

class NginxLogReader(file: String, fields: Array[String], pushed: Array[Filter],
    confMap: Map[String, String]) extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val fsPath = new org.apache.hadoop.fs.Path(file)
  private val hadoopConf = {
    val c = new org.apache.hadoop.conf.Configuration()
    confMap.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val stream = fsPath.getFileSystem(hadoopConf).open(fsPath)
  private val lines = scala.io.Source.fromInputStream(stream, "UTF-8")
  private val it = lines.getLines()
  private var row: InternalRow = _

  private def passes(get: String => String): Boolean =
    pushed.forall {
      case EqualTo(a, v: String) => get(a) == v
      case IsNotNull(a) => get(a) != null
      case _ => true
    }

  override def next(): Boolean = {
    while (it.hasNext) {
      val line = it.next()
      try {
        val node = mapper.readTree(line)
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
  override def close(): Unit = lines.close()
}
