package graft.interop

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal read-only Iceberg REST-catalog SERVER over graft-exported
  * trees — the publishing half of the REST interop: any spec-conforming
  * REST client (PyIceberg, Trino, graft's own [[RestCatalog]]) can
  * `GET /v1/config`, list namespaces/tables, and load a table's
  * CURRENT metadata pointer, which is re-read from the tree's
  * version-hint per request — so a client always sees the latest
  * export, exactly like a live catalog service fronting a writer.
  *
  * Scope is deliberately read-only (loads and listings): graft tables
  * mutate through graft commits and publish through
  * [[IcebergExport.export]]; accepting REST writes would bypass the
  * snaplog's optimistic-concurrency contract. Mutating routes answer
  * 405. Optional STATIC bearer-token auth (the spec's Authorization
  * header); `inlineMetadata` embeds the metadata document in the
  * LoadTableResult (both spec-legal response shapes, so clients of
  * either kind are served).
  *
  * Loopback-only by design: the bind address is 127.0.0.1 — exposing
  * a catalog beyond the host is a deployment concern (TLS, real auth)
  * out of a library's scope. */
object RestServe {

  final class Server private[RestServe] (http: HttpServer,
      cleanup: () => Unit = () => ()) {
    def endpoint: String = s"http://127.0.0.1:${http.getAddress.getPort}"
    def stop(): Unit = { cleanup(); http.stop(0) }
  }

  /** One served table: `root` is the exported tree directory,
    * `ensureCurrent` runs BEFORE every load of this table's metadata
    * pointer (listings never re-export — only loads pay). */
  private final class Served(val root: Path, val ensureCurrent: () => Unit)

  /** Serve NATIVE graft tables LIVE, publish-on-COMMIT (round 16): the
    * server registers a commit listener on each table's catalog, so
    * the WRITER pays the re-export at commit time — a reader's
    * `loadTable` is a metadata read (version-hint + pointer), never an
    * export, exactly the outward mirror of `refresh`'s inward pull.
    * Registration exports once up front, so the tree is current before
    * the first request. A snapshot-watermark check stays on the load
    * path as the FALLBACK for commits the listener cannot see (a
    * writer on a DIFFERENT Catalog instance of the same warehouse, or
    * a listener-time export failure) — that path re-pays the r15
    * reader-side cost but keeps content always current. Cost model: an
    * up-to-date load is one catalog head probe; each commit pays one
    * export, which is metadata-sized plus stats copying — data files
    * are referenced in place, never moved, and unchanged prior-
    * snapshot manifests are fingerprint-skipped
    * ([[IcebergExport]]'s stable writes), so a commit's export cost is
    * O(new snapshots), not O(history). Concurrent exports of one table
    * serialize on a per-table lock; every metadata file lands by
    * atomic rename, so a reader racing a re-export sees only complete
    * content, old or new. `stop()` unregisters the listeners. */
  def startLive(
      tables: Map[(String, String), (graft.table.LakehouseTable, Path)],
      port: Int = 0, token: Option[String] = None,
      inlineMetadata: Boolean = false,
      formatVersion: Int = 2): Server = {
    val served = tables.map { case (k, (tbl, dir)) =>
      val lock = new Object
      val lastExported = new java.util.concurrent.atomic.AtomicLong(-1L)
      def sync(): Unit = {
        val cur = tbl.currentSnapshotId
        if (cur != lastExported.get) lock.synchronized {
          if (cur != lastExported.get) {
            IcebergExport.export(tbl, dir, formatVersion)
            lastExported.set(cur)
          }
        }
      }
      sync() // current before the first request — loads never cold-export
      val listener: (String, String, graft.catalog.Snapshot) => Unit =
        (ns, t, _) => if (ns == tbl.namespace && t == tbl.name) sync()
      tbl.catalog.addCommitListener(listener)
      (k, new Served(dir, () => sync()),
        () => tbl.catalog.removeCommitListener(listener))
    }
    startImpl(served.map { case (k, s, _) => k -> s }.toMap,
      port, token, inlineMetadata,
      cleanup = () => served.foreach { case (_, _, off) => off() })
  }

  /** Start serving `tables` ((namespace, table) → exported tree root,
    * the dir holding `metadata/`). `port = 0` binds an ephemeral port.
    * Snapshot-frozen by contract: the version-hint is re-read per
    * request, so a caller re-running `export` publishes — for tables
    * that should publish every graft commit automatically, use
    * [[startLive]]. */
  def start(tables: Map[(String, String), Path], port: Int = 0,
      token: Option[String] = None,
      inlineMetadata: Boolean = false): Server =
    startImpl(tables.map { case (k, root) =>
      k -> new Served(root, () => ()) }, port, token, inlineMetadata)

  private def startImpl(tables: Map[(String, String), Served], port: Int,
      token: Option[String],
      inlineMetadata: Boolean,
      cleanup: () => Unit = () => ()): Server = {
    val http = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

    def respond(x: HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.add("Content-Type", "application/json")
      x.sendResponseHeaders(code, b.length)
      x.getResponseBody.write(b)
      x.close()
    }
    def jsonStr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    def currentMetadataFile(root: Path): Path = {
      val metaDir =
        if (Files.exists(root.resolve("version-hint.text"))) root
        else root.resolve("metadata")
      val v = Files.readString(metaDir.resolve("version-hint.text")).trim
      metaDir.resolve(s"v$v.metadata.json")
    }
    // the spec's %1F namespace-level separator, decoded by the URI class
    def decodeNs(seg: String): String = seg.replace('\u001f', '.')

    http.createContext("/v1/", (x: HttpExchange) => {
      try {
        val authOk = token.forall(t =>
          Option(x.getRequestHeaders.getFirst("Authorization"))
            .contains(s"Bearer $t"))
        val segs = x.getRequestURI.getPath.stripPrefix("/v1/")
          .split("/").toList.filter(_.nonEmpty)
        if (!authOk)
          respond(x, 401, """{"error":{"message":"missing or wrong bearer token","type":"NotAuthorizedException","code":401}}""")
        else if (x.getRequestMethod != "GET")
          respond(x, 405, """{"error":{"message":"this catalog is read-only: graft tables mutate through graft commits and publish via export","type":"UnsupportedOperationException","code":405}}""")
        else segs match {
          case List("config") =>
            respond(x, 200, """{"defaults":{},"overrides":{}}""")
          case List("namespaces") =>
            val nss = tables.keys.map(_._1).toSeq.distinct.sorted
            respond(x, 200, nss.map(n => s"[${jsonStr(n)}]")
              .mkString("""{"namespaces":[""", ",", "]}"))
          case List("namespaces", nsSeg, "tables") =>
            val ns = decodeNs(nsSeg)
            val names = tables.keys.collect {
              case (n, t) if n == ns => t
            }.toSeq.sorted
            respond(x, 200, names.map(t =>
              s"""{"namespace":[${jsonStr(ns)}],"name":${jsonStr(t)}}""")
              .mkString("""{"identifiers":[""", ",", "]}"))
          case List("namespaces", nsSeg, "tables", tbl) =>
            tables.get((decodeNs(nsSeg), tbl)) match {
              case None => respond(x, 404,
                s"""{"error":{"message":"no such table ${decodeNs(nsSeg)}.$tbl","type":"NoSuchTableException","code":404}}""")
              case Some(s) =>
                s.ensureCurrent()
                val f = currentMetadataFile(s.root)
                val loc = jsonStr(f.toString)
                val body =
                  if (inlineMetadata)
                    s"""{"metadata-location":$loc,"metadata":${Files.readString(f)}}"""
                  else s"""{"metadata-location":$loc}"""
                respond(x, 200, body)
            }
          case other =>
            respond(x, 404,
              s"""{"error":{"message":"no such route /v1/${other.mkString("/")}","type":"NoSuchRouteException","code":404}}""")
        }
      } catch {
        case e: Exception =>
          respond(x, 500,
            s"""{"error":{"message":${jsonStr(e.toString.take(300))},"type":"InternalServerError","code":500}}""")
      }
    })
    http.start()
    new Server(http, cleanup)
  }
}
