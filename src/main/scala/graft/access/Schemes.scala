package graft.access

import org.apache.spark.sql.SparkSession

/** Location-scheme configuration — the engine's analog of the
  * reference's accessor registry (`withParsedLocs` dispatch,
  * Accessors.hs:314-362; S3 accessor porcupine-s3/.../AWS.hs:50-105).
  *
  * In Spark, scheme dispatch is the Hadoop FileSystem registry: any
  * location whose URI scheme has a registered FS (file:, hdfs:, s3a:)
  * works in every engine read/write path (Formats, Memo, listFolder,
  * writeBlobs) with no engine changes. HTTP is the one scheme Hadoop
  * lacks a FS for — it's a dedicated accessor ([[Http]]).
  *
  * These helpers just set the well-known Hadoop conf keys; the
  * hadoop-aws jar provides retries with exponential backoff and
  * multipart upload natively (the reference's hand-rolled retry /
  * single-shot-upload TODOs, TaskPipelineUtils.hs:83,158-175, come for
  * free).
  */
object Schemes {

  /** Configure s3a access for this session. Pass None for credentials
    * to use the default provider chain (env vars, instance profile). */
  def configureS3(spark: SparkSession,
                  endpoint: Option[String] = None,
                  accessKey: Option[String] = None,
                  secretKey: Option[String] = None,
                  pathStyleAccess: Boolean = false): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    endpoint.foreach(conf.set("fs.s3a.endpoint", _))
    accessKey.foreach(conf.set("fs.s3a.access.key", _))
    secretKey.foreach(conf.set("fs.s3a.secret.key", _))
    conf.set("fs.s3a.path.style.access", pathStyleAccess.toString)
    // scale posture: bounded retries + multipart are on by default in
    // hadoop-aws; pin the committer away from rename-based commits
    conf.set("fs.s3a.committer.name", "magic")
    conf.set("mapreduce.outputcommitter.factory.scheme.s3a",
      "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory")
  }

  /** True when the scheme of `location` has a registered Hadoop FS in
    * this session (the accessor-dispatch check, ACC:314-336: unknown
    * schemes fail at bind time, not mid-pipeline). */
  def isSupported(spark: SparkSession, location: String): Boolean =
    try {
      new org.apache.hadoop.fs.Path(location)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      true
    } catch { case _: Exception => false }
}
