package graft.sources

import graft.access.Http
import graft.loc.LocTemplate
import graft.rep.Repetition
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util

/** DataSourceV2 HTTP source — the Spark-native form of the reference's
  * porcupine-http accessor (Data/Locations/Accessors/HTTP.hs:58-153):
  * `{var}`-templated URLs fetched one-per-index, but partitioned
  * across EXECUTORS so a thousand-document API sweep runs
  * cluster-parallel, with per-row error capture (one dead URL doesn't
  * kill the read — tryLoadDataStream semantics, VFA:114-122).
  *
  * {{{
  * spark.read.format("graft-http")
  *   .option("urlTemplate", "https://api.example.com/users/{uid}.json")
  *   .option("var", "uid")
  *   .option("indices", "0..999")        // IndexRange syntax
  *   .option("parallelism", "32")        // default 16
  *   .option("method", "GET")            // or POST
  *   .load()
  * // => (rep_index string, body string, error string)
  * }}}
  *
  * Rows carry raw bodies; parse downstream with `from_json` /
  * `spark.read.json(ds)` like any layer. A single non-templated `url`
  * option fetches one document (driver-free: still an executor task).
  */
class HttpDataSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-http"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpDataSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HttpTable(new CaseInsensitiveStringMap(properties))
}

object HttpDataSource {
  val schema: StructType = StructType(Seq(
    StructField("rep_index", StringType, nullable = false),
    StructField("body", StringType, nullable = true),
    StructField("error", StringType, nullable = true)))
}

final class HttpTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-http(${options.getOrDefault("urlTemplate",
      options.getOrDefault("url", "?"))})"
  override def schema(): StructType = HttpDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options)
    merged.putAll(opts)
    new HttpScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

final class HttpScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = HttpDataSource.schema
  override def toBatch: Batch = this

  private def urls: Seq[(String, String)] = {
    Option(options.get("urlTemplate")) match {
      case Some(tmpl) =>
        val varName = options.getOrDefault("var", "i")
        val indices = Repetition.parseIndexRange(
          Option(options.get("indices")).getOrElse(sys.error(
            "graft-http: option 'indices' required with urlTemplate")))
        val t = LocTemplate(tmpl)
        indices.map(i => i -> t.splice(Map(varName -> i)).raw)
      case None =>
        val url = Option(options.get("url")).getOrElse(sys.error(
          "graft-http: option 'url' or 'urlTemplate' required"))
        Seq("0" -> url)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val all = urls
    if (all.isEmpty) return Array.empty // empty index range: empty scan
    val parallelism = math.max(1, math.min(
      options.getOrDefault("parallelism", "16").toInt, all.size))
    val perPart = (all.size + parallelism - 1) / parallelism
    all.grouped(perPart).map(g =>
      HttpPartition(g.toArray): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new HttpReaderFactory(
      options.getOrDefault("method", "GET"),
      options.getOrDefault("timeoutSeconds", "30").toLong,
      options.getOrDefault("accept", "application/json"))
}

final case class HttpPartition(urls: Array[(String, String)])
    extends InputPartition

final class HttpReaderFactory(method: String, timeoutSeconds: Long,
                              accept: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[HttpPartition]
    new PartitionReader[InternalRow] {
      private val conf = Http.HttpConf(method,
        java.time.Duration.ofSeconds(timeoutSeconds), accept)
      private var i = -1
      override def next(): Boolean = { i += 1; i < part.urls.length }
      override def get(): InternalRow = {
        val (idx, url) = part.urls(i)
        val (body, err) =
          try (Http.fetch(url, conf), null: String)
          catch { case e: Exception => (null: String, e.toString) }
        InternalRow(
          UTF8String.fromString(idx),
          if (body == null) null else UTF8String.fromString(body),
          if (err == null) null else UTF8String.fromString(err))
      }
      override def close(): Unit = ()
    }
  }
}
