package graft.io

import java.net.{HttpURLConnection, URL}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP upload sink for profile rows — the engine's equivalent of the
  * reference's monitoring-service uploader
  * (spark/src/main/scala/com/whylogs/spark/WhyLogs.scala:179-264): each
  * profile row is serialized to a `DatasetProfileMessage` binary ON THE
  * EXECUTOR and pushed over HTTP from a `foreachPartition` loop, with
  * bounded retries and exponential backoff
  * (RetryUtil.scala:18-48: 3 tries, 2x backoff). No driver collect — the
  * driver never sees a profile byte; a 1000-executor job uploads from
  * 1000 places in parallel, and per-group profiles are KBs each, so the
  * sink's network cost is groups x KBs regardless of input size.
  *
  * A row that still fails after the last try throws [[PermanentFailure]],
  * which fails the Spark task (and with it the job) — failed uploads
  * surface, they are never dropped silently.
  */
object ProfileUpload {

  /** Mirrors the reference RetryConfig (RetryUtil.scala:12): `maxTries`
    * total attempts, first backoff `initialWaitMillis`, doubling after
    * each failure.
    */
  final case class RetryConfig(maxTries: Int = 3, initialWaitMillis: Long = 1000L)

  /** Terminal upload failure after exhausting retries; `getCause` is the
    * LAST attempt's failure (the reference wraps the previous attempt's
    * throwable — RetryUtil.scala:36-42 — which loses the final error; we
    * keep the freshest one).
    */
  final class PermanentFailure(msg: String, cause: Throwable)
      extends RuntimeException(msg, cause)

  /** Run `work` up to `config.maxTries` times, sleeping
    * initialWaitMillis * 2^(attempt-1) between failures. Synchronous —
    * the caller is an executor task thread that must not outlive its
    * work, so there is no Future indirection (the reference's
    * global-ExecutionContext Futures are awaited immediately anyway,
    * WhyLogs.scala:236-244).
    */
  def withRetries[T](config: RetryConfig = RetryConfig())(work: => T): T = {
    var attempt = 1
    var wait = config.initialWaitMillis
    while (true) {
      try {
        return work
      } catch {
        case t: Throwable =>
          if (attempt >= config.maxTries)
            throw new PermanentFailure(
              s"Failed too many times ($attempt tries)", t)
          Thread.sleep(wait)
          wait *= 2
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Upload every profile row of `profiles` (a profile frame from
    * `ProfileSession.aggProfiles()`, plus any group-key columns) to
    * `endpoint` as one POST per profile: body = the row's
    * `DatasetProfileMessage` bytes, `Content-Type:
    * application/octet-stream`, `X-API-Key: apiKey`. Any non-2xx
    * response is a failed attempt and is retried per `retry`.
    */
  def upload(
      profiles: DataFrame,
      endpoint: String,
      apiKey: String,
      sessionId: String = "graft",
      retry: RetryConfig = RetryConfig()): Unit = {
    val withProto = ProfileIO.withProtoColumn(profiles, sessionId)
      .select(col("why_profile"))
    withProto.foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          val bytes = r.getAs[Array[Byte]](0)
          withRetries(retry)(postOnce(endpoint, apiKey, bytes))
        }
    }
  }

  /** One HTTP POST attempt; throws on any non-2xx status. */
  private def postOnce(
      endpoint: String, apiKey: String, body: Array[Byte]): Unit = {
    val conn = new URL(endpoint).openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setDoOutput(true)
    conn.setRequestMethod("POST")
    conn.setRequestProperty("Content-Type", "application/octet-stream")
    conn.setRequestProperty("X-API-Key", apiKey)
    conn.setFixedLengthStreamingMode(body.length)
    val out = conn.getOutputStream
    try out.write(body) finally out.close()
    val code = conn.getResponseCode
    // drain whichever stream the server produced so the socket returns to
    // the JVM's keep-alive pool (one partition uploads many rows over the
    // same connection)
    val in = if (code >= 400) conn.getErrorStream else conn.getInputStream
    if (in != null) {
      try { while (in.read() >= 0) () } finally in.close()
    }
    if (code < 200 || code >= 300)
      throw new RuntimeException(
        s"Error uploading profile: $code ${conn.getResponseMessage}")
  }
}
