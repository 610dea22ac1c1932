package graft.io

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import java.util.concurrent.ConcurrentLinkedQueue

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSuiteBase
import graft.profile.ProfileSession.ProfilingOps

/** Executor-side HTTP upload sink, driven against an in-JVM HTTP server:
  * per-row upload, retry-on-5xx with backoff, and failure surfacing —
  * the reference's uploader contract (WhyLogs.scala:179-264,
  * RetryUtil.scala:18-48) without the proprietary service behind it.
  */
class ProfileUploadSpec extends AnyFunSuite with Matchers with SparkSuiteBase {

  private val fastRetry = ProfileUpload.RetryConfig(
    maxTries = 3, initialWaitMillis = 5L)

  /** Starts a server invoking `handler` per request; returns (url, stop). */
  private def withServer(handler: HttpExchange => Unit)(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/upload", (ex: HttpExchange) => {
      try handler(ex) finally ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/upload")
    finally server.stop(0)
  }

  private def readBody(ex: HttpExchange): Array[Byte] = {
    val in = ex.getRequestBody
    val buf = new java.io.ByteArrayOutputStream()
    val chunk = new Array[Byte](4096)
    var n = in.read(chunk)
    while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
    buf.toByteArray
  }

  private def profiles3 = {
    import spark.implicits._
    Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("c", 4.0))
      .toDF("k", "v")
      .newProfilingSession().groupBy("k").aggProfiles()
  }

  test("uploads one parseable DatasetProfileMessage per profile row") {
    val bodies = new ConcurrentLinkedQueue[Array[Byte]]()
    val keys = new ConcurrentLinkedQueue[String]()
    withServer { ex =>
      bodies.add(readBody(ex))
      keys.add(ex.getRequestHeaders.getFirst("X-API-Key"))
      ex.sendResponseHeaders(200, -1)
    } { url =>
      ProfileUpload.upload(profiles3, url, "sekret", retry = fastRetry)
      bodies.size shouldBe 3
      keys.asScalaSet shouldBe Set("sekret")
      // each body is a real wire-format profile with the v column tracked
      val counts = bodies.toArray(Array.empty[Array[Byte]])
        .map(b => ProfileProto.fromBytes(b).columns("v").numbers.count)
        .sorted
      counts.toSeq shouldBe Seq(1L, 1L, 2L)
    }
  }

  test("retries on 5xx with backoff and succeeds within maxTries") {
    val attempts = new AtomicInteger(0)
    val ok = new AtomicInteger(0)
    withServer { ex =>
      readBody(ex)
      // first two attempts (across any row) fail; the per-row retry loop
      // must absorb them
      if (attempts.incrementAndGet() <= 2) {
        ex.sendResponseHeaders(503, -1)
      } else {
        ok.incrementAndGet()
        ex.sendResponseHeaders(200, -1)
      }
    } { url =>
      ProfileUpload.upload(profiles3.coalesce(1), url, "k", retry = fastRetry)
      ok.get() shouldBe 3 // every row eventually landed
      attempts.get() shouldBe 5 // 2 failures + 3 successes
    }
  }

  test("permanent failure surfaces as a failed job, not a silent drop") {
    val attempts = new AtomicInteger(0)
    withServer { ex =>
      readBody(ex)
      attempts.incrementAndGet()
      ex.sendResponseHeaders(500, -1)
    } { url =>
      val e = intercept[Exception] {
        ProfileUpload.upload(profiles3.coalesce(1), url, "k",
          retry = fastRetry)
      }
      // cause chain carries the PermanentFailure marker
      var t: Throwable = e
      var found = false
      while (t != null && !found) {
        found = t.isInstanceOf[ProfileUpload.PermanentFailure]
        t = t.getCause
      }
      found shouldBe true
      attempts.get() shouldBe 3 // maxTries on the first row, then abort
    }
  }

  test("withRetries backoff doubles and rethrows the LAST failure") {
    val times = collection.mutable.ArrayBuffer.empty[Long]
    val e = intercept[ProfileUpload.PermanentFailure] {
      ProfileUpload.withRetries(
        ProfileUpload.RetryConfig(3, 40L)) {
        times += System.nanoTime()
        throw new RuntimeException(s"boom-${times.size}")
      }
    }
    e.getCause.getMessage shouldBe "boom-3"
    times.size shouldBe 3
    val gap1 = (times(1) - times(0)) / 1e6
    val gap2 = (times(2) - times(1)) / 1e6
    gap1 should be >= 40.0
    gap2 should be >= 80.0
  }

  private implicit class QueueOps(q: ConcurrentLinkedQueue[String]) {
    def asScalaSet: Set[String] = {
      val it = q.iterator()
      val b = Set.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
  }
}
