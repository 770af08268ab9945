package graft.sources.v2

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The connector's HTTP transport against a real localhost server: the
  * server speaks the [[ItemsProtocol]] wire format over a seeded cell
  * set and COUNTS requests per endpoint, so pushdown and runtime-filter
  * pruning are asserted as requests-not-made — the observable a remote
  * API actually bills for. The server delegates all semantics to the
  * same [[ItemsProtocol]] functions the client uses (transport-only
  * twin; semantics cannot fork). `ItemsStore` remains the oracle-gate
  * path — these reads go over the wire.
  */
class ItemsHttpSpec extends SparkSpec {
  import graft.sources.v2.{ItemsStore => IS}

  /** Minimal paged-API server: /ids, /count, /cells reads plus /upsert
    * mutations over a keyed cell map, per-path hit counters. All
    * semantics delegate to ItemsProtocol (transport-only twin).
    */
  private final class ApiServer(seedCells: Seq[IS.Cell]) extends AutoCloseable {
    val hits = new ConcurrentHashMap[String, Integer]()
    private val store = new ConcurrentHashMap[(Long, String), IS.Cell]()
    seedCells.foreach(c => store.put((c.itemId, c.columnId), c))
    private def cells: Seq[IS.Cell] = {
      import scala.jdk.CollectionConverters._
      store.values.asScala.toSeq.sortBy(c => (c.itemId, c.columnId))
    }
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    private def handle(path: String)(body: (String, Array[Byte]) => String): Unit =
      server.createContext(path, (ex: HttpExchange) => {
        hits.merge(path, 1, (a, b) => a + b)
        val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        val reqBody = ex.getRequestBody.readAllBytes()
        val out = body(q, reqBody).getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, out.length)
        ex.getResponseBody.write(out)
        ex.close()
      })
    handle("/ids") { (q, _) =>
      ItemsProtocol.encodeIds(ItemsProtocol.pageIdsOf(
        cells, ItemsProtocol.parseFilters(q), ItemsProtocol.parseLimit(q)))
    }
    handle("/count") { (q, _) =>
      cells.count(ItemsProtocol.keep(_, ItemsProtocol.parseFilters(q))).toString
    }
    handle("/cells") { (q, _) =>
      val ids = ItemsProtocol.parseIds(q)
      val filters = ItemsProtocol.parseFilters(q)
      val cellsOut =
        if (q.contains("ids=")) ItemsProtocol.pageCells(
          cells.iterator, ids, filters, ItemsProtocol.parseLimit(q))
        else cells.iterator.filter(ItemsProtocol.keep(_, filters)) // agg-scan shape
      ItemsProtocol.encodeCells(cellsOut)
    }
    handle("/upsert") { (_, body) =>
      var n = 0
      ItemsProtocol.decodeCells(new String(body, StandardCharsets.UTF_8)).foreach { c =>
        store.put((c.itemId, c.columnId), c); n += 1
      }
      n.toString
    }
    server.start()
    def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
    def hitCount(path: String): Int = hits.getOrDefault(path, 0)
    def snapshot: Set[IS.Cell] = cells.toSet
    override def close(): Unit = server.stop(0)
  }

  private def seed(n: Int): Seq[IS.Cell] =
    (0 until n).flatMap(i => Seq(
      IS.Cell(i.toLong, "name", s"ITEM $i", 1000L + i),
      IS.Cell(i.toLong, "status", if (i % 3 == 0) "done" else "open", 2000L + i)))

  private def httpDf(base: String) =
    spark.read.format(ItemsSource.ShortName)
      .option("store", "unused_http")
      .option("transport", "http")
      .option("base_url", base)
      .load()

  test("round trip over localhost: HTTP reads equal the store path bit for bit") {
    val cells = seed(120) // 120 ids → 3 pages of 50
    IS.put("http_twin", cells)
    val srv = new ApiServer(cells)
    try {
      val viaHttp = httpDf(srv.base).collect().map(_.toSeq).toSet
      val viaStore = spark.read.format(ItemsSource.ShortName)
        .option("store", "http_twin").load().collect().map(_.toSeq).toSet
      assert(viaHttp === viaStore)
      assert(viaHttp.size === 240)
      // one /cells call per planned 50-id page
      assert(srv.hitCount("/cells") === 3, srv.hits.toString)
    } finally { srv.close(); IS.drop("http_twin") }
  }

  test("pushdown is visible server-side: an id predicate costs one page request") {
    val srv = new ApiServer(seed(120))
    try {
      val got = httpDf(srv.base)
        .filter(col("item_id") === 7L && col("column_id") === "name")
        .select("text").collect().map(_.getString(0))
      assert(got.toSeq === Seq("ITEM 7"))
      assert(srv.hitCount("/cells") === 1, srv.hits.toString)
    } finally srv.close()
  }

  test("runtime filtering prunes API pages at the server: 3 planned pages -> 1 fetched") {
    import spark.implicits._
    val srv = new ApiServer(seed(120))
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
      .map(k => k -> conf.getOption(k))
    try {
      // same deterministic-DPP recipe as ItemsSourceSpec's store-path
      // twin: force the fallback ratio path, and use a real parquet dim
      // whose selective filter survives (a LocalRelation folds it away)
      conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
      val dim = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
        .select($"n_nationkey".cast("long").as("id"))
        .filter($"id" === 7L)
      val fact = httpDf(srv.base)
      val joined = fact.join(broadcast(dim), fact("item_id") === dim("id"))
        .select("item_id", "column_id", "text")
      assert(joined.collect().length === 2) // name + status cells of id 7
      // the server observes only the runtime-FILTERED page: one /cells
      // call (id 7's page) instead of the unfiltered three
      assert(srv.hitCount("/cells") === 1,
        s"server saw ${srv.hitCount("/cells")} page fetches: ${srv.hits}")
    } finally {
      saved.foreach { case (k, v) => v.fold(conf.unset(k))(conf.set(k, _)) }
      srv.close()
    }
  }

  test("LIMIT truncates paging over the wire") {
    val srv = new ApiServer(seed(120))
    try {
      assert(httpDf(srv.base).limit(5).collect().length === 5)
      // ceil(5 cells) fits the first 50-id page: exactly one /cells call
      assert(srv.hitCount("/cells") === 1, srv.hits.toString)
    } finally srv.close()
  }

  test("aggregate pushdown rides the wire as one API call") {
    val srv = new ApiServer(seed(30))
    try {
      val got = httpDf(srv.base).groupBy("column_id").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === Map("name" -> 30L, "status" -> 30L))
      assert(srv.hitCount("/cells") === 1, srv.hits.toString) // the single agg response
    } finally srv.close()
  }

  test("write path over the wire: page-grain upsert batches, idempotent redelivery") {
    import spark.implicits._
    val srv = new ApiServer(Seq(IS.Cell(1L, "status", "stale", 1L)))
    try {
      val df = (1L to 120L).map(i => (i, "status", s"v$i", 10L + i))
        .toDF("item_id", "column_id", "text", "created_at")
      def writeOnce(): Unit = df.coalesce(1).write.format(ItemsSource.ShortName)
        .option("store", "unused_http_w")
        .option("transport", "http")
        .option("base_url", srv.base)
        .mode("append").save()
      writeOnce()
      // 120 rows in one partition -> ceil(120/50) = 3 page-grain POSTs
      assert(srv.hitCount("/upsert") === 3, srv.hits.toString)
      assert(srv.snapshot.size === 120)
      assert(srv.snapshot.contains(IS.Cell(1L, "status", "v1", 11L))) // upsert beat the seed
      val before = srv.snapshot
      writeOnce() // redelivery: re-applied upserts converge
      assert(srv.snapshot === before)
      // and the write is immediately readable back over the same wire
      val got = httpDf(srv.base).filter(col("item_id") === 7L)
        .select("text").collect().map(_.getString(0))
      assert(got.toSeq === Seq("v7"))
    } finally srv.close()
  }

  test("wire format round-trips hostile values: tabs, newlines, unicode, null text") {
    val nasty = Seq(
      IS.Cell(1L, "col\twith\ttabs", "text\nwith\nnewlines", 1L),
      IS.Cell(2L, "unicode✓", "héllo ✓", 2L),
      IS.Cell(3L, "plain", null, 3L),
      IS.Cell(4L, "~null~", "literal marker value", 4L))
    val decoded = ItemsProtocol.decodeCells(ItemsProtocol.encodeCells(nasty.iterator)).toSeq
    // collision-free: URL-encoding escapes '~', so a REAL value equal to
    // the null marker still round-trips as itself
    assert(decoded === nasty)
    val srv = new ApiServer(nasty.take(3))
    try {
      val got = httpDf(srv.base).collect()
      assert(got.length === 3)
      assert(got.map(_.getString(1)).toSet === Set("col\twith\ttabs", "unicode✓", "plain"))
    } finally srv.close()
  }
}
