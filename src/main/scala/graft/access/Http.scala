package graft.access

import graft.task.PTask
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.net.URI
import java.time.Duration

/** HTTP location accessor — reference porcupine-http
  * (Data/Locations/Accessors/HTTP.hs:58-153): GET/POST with
  * configurable verb, timeout, and accept header; `{var}`-templated
  * URLs fetch one document per index.
  *
  * Architecture: single fetches are driver-side (config-sized payloads
  * — the reference uses HTTP for API documents, not bulk data);
  * indexed fetches fan out on EXECUTORS via a parallelized URL
  * dataset, so a thousand-URL sweep is cluster-parallel. Responses
  * land as rows and flow into `spark.read.json`/csv like any layer.
  */
object Http {

  final case class HttpConf(
      method: String = "GET",
      timeout: Duration = Duration.ofSeconds(30),
      accept: String = "application/json",
      body: Option[String] = None)

  /** ONE HttpClient per JVM (it is thread-safe and pools
    * connections): building a client per fetch would spawn a selector
    * thread + socket pool per URL — per ROW on the executor-side
    * paths — exhausting threads and file descriptors on a large
    * sweep. Per-request timeouts still come from the conf. */
  private lazy val sharedClient: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(30)).build()

  /** One driver-side fetch (used by single-URL reads). */
  def fetch(url: String, conf: HttpConf = HttpConf()): String = {
    val client = sharedClient
    val base = HttpRequest.newBuilder(URI.create(url))
      .timeout(conf.timeout).header("Accept", conf.accept)
    val req = (conf.method match {
      case "POST" => base.POST(HttpRequest.BodyPublishers.ofString(
        conf.body.getOrElse("")))
      case _ => base.GET()
    }).build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} for $url")
    resp.body()
  }

  /** Read one JSON document from a URL as a DataFrame. */
  def readJson(spark: SparkSession, url: String,
               conf: HttpConf = HttpConf()): DataFrame = {
    import spark.implicits._
    spark.read.json(spark.createDataset(Seq(fetch(url, conf))))
  }

  /** Indexed fetch: `{var}`-templated URL, one fetch per index,
    * EXECUTOR-side (mapPartitions over a parallelized index set) —
    * the scale path for API sweeps. Failures surface per-row as
    * (idx, null, error) so one dead URL doesn't kill the sweep
    * (the reference's tryLoadDataStream semantics, VFA:114-122). */
  def fetchIndexed(spark: SparkSession, urlTemplate: String,
                   varName: String, indices: Seq[String],
                   conf: HttpConf = HttpConf(),
                   parallelism: Int = 16): DataFrame = {
    import spark.implicits._
    val tmpl = graft.loc.LocTemplate(urlTemplate)
    val urls = indices.map(i => i -> tmpl.splice(Map(varName -> i)).raw)
    spark.createDataset(urls)
      .repartition(math.min(parallelism, math.max(1, urls.size)))
      .mapPartitions { it =>
        it.map { case (idx, url) =>
          try (idx, fetch(url, conf), null: String)
          catch { case e: Exception => (idx, null: String, e.toString) }
        }
      }
      .toDF("rep_index", "body", "error")
  }

  /** HTTP write side — the reference accessor's configurable
    * writeMethod (HTTP.hs:58-153 `{url, writeMethod}`): POST each
    * row's JSON to the (optionally `{var}`-templated, spliced per row
    * from column values) URL, EXECUTOR-side via foreachPartition.
    * Returns per-row (url, status-or-error) outcomes collected to a
    * DataFrame for auditing. */
  def postRows(df: org.apache.spark.sql.DataFrame, urlTemplate: String,
               conf: HttpConf = HttpConf(method = "POST"))
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vars = graft.loc.LocTemplate(urlTemplate).variables
    val withJson = df.withColumn("_body",
      org.apache.spark.sql.functions.to_json(
        org.apache.spark.sql.functions.struct(
          df.columns.toIndexedSeq.map(
            org.apache.spark.sql.functions.col): _*)))
    withJson.mapPartitions { rows =>
      rows.map { row =>
        val url = vars.foldLeft(urlTemplate)((u, v) =>
          u.replace(s"{$v}", String.valueOf(row.getAs[Any](v))))
        val body = row.getAs[String]("_body")
        try {
          fetch(url, conf.copy(body = Some(body)))
          (url, "ok")
        } catch { case e: Exception => (url, e.toString) }
      }
    }.toDF("url", "outcome")
  }

  /** Catalog-level HTTP source task: fetch + parse as JSON, with the
    * engine's content-hash cache keyed by URL (reference example-Poke
    * caches API reads, ExamplePokeAPI.hs:44-49). */
  def loadJsonUrl(url: String, salt: String = ""): PTask[Any, DataFrame] =
    PTask.task((ctx, _) => ctx.cache match {
      case Some(memo) =>
        val key = memo.keyOf(Seq("http", url, salt))
        memo.getOrElseUpdate(key)(readJson(ctx.spark, url))
      case None => readJson(ctx.spark, url)
    })
}
