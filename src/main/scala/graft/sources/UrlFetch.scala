package graft.sources

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.Dataset

/** S7 — the public-URL binary fetch (`Leyton_depot.py:485-489`,
  * `download_file_from_public_url`) as a distributed source seam.
  *
  * Reference semantics reproduced exactly:
  *   - null/empty URL → (empty content, no content type), NOT an error;
  *   - otherwise GET with redirects + 60 s timeout, returning
  *     (bytes, Content-Type header).
  * Where the reference lets the exception propagate (its caller retries
  * the whole item), a 100 TB fetch stage must not kill a 10⁶-row task
  * over one dead link — so failures are captured PER ROW into an error
  * column and the row survives; the caller decides whether to retry,
  * quarantine, or drop.
  *
  * Scale shape: `mapPartitions` opens ONE transport per partition
  * (connection/keep-alive reuse across that partition's rows — the whole
  * point of partition-grain fetching) and closes it after the last row.
  * The transport is looked up BY NAME from an executor-local registry,
  * so nothing network-shaped is serialized into the closure; the in-JVM
  * stub registers the same way the real HTTP transport does (the
  * [[graft.sinks.DriveStore]] pattern).
  */
object UrlFetch {

  /** One open connection context; `get` throws on failure. */
  trait Transport extends AutoCloseable {
    /** Fetch a URL → (content bytes, Content-Type when the server sent one). */
    def get(url: String): (Array[Byte], Option[String])
    /** POST a body → (response bytes, Content-Type). Only transports
      * that back a mutation surface implement it (HTTP does; the
      * read-only stand-ins keep the default).
      */
    def post(url: String, body: Array[Byte]): (Array[Byte], Option[String]) =
      throw new UnsupportedOperationException(s"transport is read-only: cannot POST $url")
    override def close(): Unit = ()
  }

  /** Executor-local transport registry: name → factory. Register once
    * per JVM (static init / library default); closures carry only the
    * name.
    */
  object Transports {
    private val factories = new ConcurrentHashMap[String, () => Transport]()
    def register(name: String, factory: () => Transport): Unit =
      factories.put(name, factory)
    def open(name: String): Transport = {
      val f = factories.get(name)
      require(f != null, s"no transport registered under '$name'")
      f()
    }
    // The real transport is always available under "http"; "echo" is the
    // deterministic offline stand-in (payload derived from the url).
    register("http", () => new HttpTransport)
    register("echo", () => EchoTransport)
  }

  /** Deterministic offline transport: content = "payload:<url>" bytes,
    * constant content type, and any url ending in "/dead" fails — a
    * fetch result both engines can derive from the url alone, which is
    * what lets the fetch stage sit behind the DuckDB oracle gate
    * (`q_url_fetch`). Stateless, hence an object.
    */
  object EchoTransport extends Transport {
    override def get(url: String): (Array[Byte], Option[String]) = {
      if (url.endsWith("/dead")) throw new java.io.IOException(s"refused $url")
      (s"payload:$url".getBytes("UTF-8"), Some("application/octet-stream"))
    }
  }

  /** Production transport: JDK HttpClient, redirects followed, 60 s
    * timeout — the reference's `requests.get(..., allow_redirects=True,
    * timeout=60)`. One client per partition; HTTP keep-alive reuses
    * connections across the partition's rows.
    */
  final class HttpTransport extends Transport {
    private val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.ALWAYS)
      .connectTimeout(java.time.Duration.ofSeconds(60))
      .build()
    override def get(url: String): (Array[Byte], Option[String]) = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(60)).GET().build()
      send(url, req)
    }
    override def post(url: String, body: Array[Byte]): (Array[Byte], Option[String]) = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(60))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(body)).build()
      send(url, req)
    }
    private def send(url: String, req: java.net.http.HttpRequest): (Array[Byte], Option[String]) = {
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      // raise_for_status analog: 4xx/5xx is a failure, not content
      if (resp.statusCode() >= 400)
        throw new java.io.IOException(s"HTTP ${resp.statusCode()} for $url")
      (resp.body(), Option(resp.headers().firstValue("Content-Type").orElse(null)))
    }
  }

  /** In-JVM stub for offline tests: seed url → payload, or url → failure.
    * Counts opens/gets so specs can assert connection reuse (one open
    * per partition, not per row).
    */
  final class StubTransport(name: String) extends Transport {
    StubStore.opens.merge(name, 1, _ + _)
    override def get(url: String): (Array[Byte], Option[String]) = {
      StubStore.gets.merge(name, 1, _ + _)
      val fail = StubStore.failures(name).get(url)
      if (fail != null) throw new java.io.IOException(fail)
      val hit = StubStore.payloads(name).get(url)
      if (hit == null) throw new java.io.IOException(s"HTTP 404 for $url")
      hit
    }
  }

  /** Seed/inspection side of the stub, keyed by store name. */
  object StubStore {
    private[UrlFetch] val payloadStores =
      new ConcurrentHashMap[String, ConcurrentHashMap[String, (Array[Byte], Option[String])]]()
    private[UrlFetch] val failureStores =
      new ConcurrentHashMap[String, ConcurrentHashMap[String, String]]()
    private[sources] val opens = new ConcurrentHashMap[String, Int]()
    private[sources] val gets = new ConcurrentHashMap[String, Int]()
    private[UrlFetch] def payloads(name: String) =
      payloadStores.computeIfAbsent(name, _ => new ConcurrentHashMap)
    private[UrlFetch] def failures(name: String) =
      failureStores.computeIfAbsent(name, _ => new ConcurrentHashMap)

    /** Register the stub under `name` and seed it. */
    def install(name: String,
                ok: Map[String, (Array[Byte], Option[String])],
                failing: Map[String, String] = Map.empty): Unit = {
      ok.foreach { case (u, p) => payloads(name).put(u, p) }
      failing.foreach { case (u, msg) => failures(name).put(u, msg) }
      Transports.register(name, () => new StubTransport(name))
    }
    def openCount(name: String): Int = opens.getOrDefault(name, 0)
    def getCount(name: String): Int = gets.getOrDefault(name, 0)
    def drop(name: String): Unit = {
      payloadStores.remove(name); failureStores.remove(name)
      opens.remove(name); gets.remove(name)
    }
  }

  /** Input/output rows of the fetch stage. `content_type`/`fetch_error`
    * are nullable Strings (not Options) so the output writes cleanly to
    * parquet and filters stay plain column predicates.
    */
  case class UrlRow(id: Long, url: String)
  case class FetchedRow(id: Long, url: String, content: Array[Byte],
                        content_type: String, fetch_error: String)

  /** The fetch stage: one transport per partition, per-row error
    * capture. Rows with null/empty URLs return empty content with no
    * error (reference behavior); failed fetches return an error row
    * with null content — never an exception out of the task.
    */
  def fetchAll(ds: Dataset[UrlRow], transportName: String): Dataset[FetchedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val t = Transports.open(transportName)
        def fetchOne(r: UrlRow): FetchedRow =
          if (r.url == null || r.url.isEmpty)
            FetchedRow(r.id, r.url, Array.emptyByteArray, null, null)
          else try {
            val (bytes, ctype) = t.get(r.url)
            FetchedRow(r.id, r.url, bytes, ctype.orNull, null)
          } catch {
            case e: Exception =>
              FetchedRow(r.id, r.url, null, null,
                s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
          }
        org.apache.spark.TaskContext.get() match {
          case ctx if ctx != null =>
            // the iterator is lazy: close on task completion (covers both
            // normal exhaustion and task failure), never before consumption
            ctx.addTaskCompletionListener[Unit](_ => t.close())
            rows.map(fetchOne)
          case _ =>
            // no task context (driver-side/local evaluation): close once
            // the iterator drains so the transport never leaks
            new Iterator[FetchedRow] {
              private var closed = false
              def hasNext: Boolean = {
                val h = rows.hasNext
                if (!h && !closed) { closed = true; t.close() }
                h
              }
              def next(): FetchedRow = fetchOne(rows.next())
            }
        }
      }
    }
  }
}
