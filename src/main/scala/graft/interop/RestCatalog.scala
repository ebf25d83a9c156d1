package graft.interop

import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Minimal Iceberg REST-catalog CLIENT (the public REST OpenAPI spec:
  * `GET /v1/config`, `/v1/namespaces`, `/v1/namespaces/{ns}/tables`,
  * `/v1/namespaces/{ns}/tables/{table}`), scoped to what table
  * ADOPTION needs — the modern Iceberg deployment shape serves table
  * pointers over REST while manifests and data stay in object storage,
  * so the graft import/refresh machinery only needs the catalog to
  * answer "where is this table's current metadata document".
  *
  * The client is deliberately thin:
  *  - `loadTable` returns the LoadTableResult's `metadata-location`
  *    and, when the server inlines it, the `metadata` document itself —
  *    [[IcebergImport.registerFromRest]] turns either into the same
  *    parsed tree the directory walk produces.
  *  - Auth is a STATIC bearer token (the spec's
  *    `Authorization: Bearer` header). OAuth token exchange flows are
  *    out of scope — pass a pre-issued token; it is NEVER persisted
  *    into table properties (a refresh re-supplies it per call).
  *  - Errors refuse loudly with the server's error payload — a 404 is
  *    "no such table", anything else non-2xx surfaces status + body.
  *
  * Multi-level namespaces use the spec's `%1F` unit-separator encoding
  * (`a.b` → `a%1Fb` in the URL path). */
object RestCatalog {

  /** One LoadTableResult, reduced to adoption's needs. */
  final case class LoadedTable(
      metadataLocation: String,
      metadata: Option[JValue])

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(30))
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  /** The spec encodes namespace levels with the 0x1F unit separator,
    * then URL-escapes — a single-level namespace is just escaped. */
  private def encodeNs(ns: String): String =
    URLEncoder.encode(ns.replace('.', '\u001f'), StandardCharsets.UTF_8)

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8)

  private def get(endpoint: String, path: String,
      token: Option[String]): JValue = {
    val base = endpoint.stripSuffix("/")
    var b = HttpRequest.newBuilder(java.net.URI.create(s"$base$path"))
      .timeout(java.time.Duration.ofSeconds(60))
      .header("Accept", "application/json")
      .GET()
    token.foreach(t => b = b.header("Authorization", s"Bearer $t"))
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    resp.statusCode() match {
      case ok if ok >= 200 && ok < 300 => JsonMethods.parse(resp.body())
      case 404 => throw new IllegalArgumentException(
        s"REST catalog $base$path: not found (404) — " +
          s"${resp.body().take(500)}")
      case other => throw new IllegalArgumentException(
        s"REST catalog $base$path: HTTP $other — ${resp.body().take(500)}")
    }
  }

  /** `GET /v1/config` — server handshake; returns the merged defaults/
    * overrides properties (callers rarely need them, but the call is
    * the spec's liveness probe). */
  def config(endpoint: String, token: Option[String] = None)
      : Map[String, String] = {
    val j = get(endpoint, "/v1/config", token)
    def props(v: JValue): Map[String, String] = v match {
      case JObject(fs) => fs.collect { case (k, JString(s)) => k -> s }.toMap
      case _ => Map.empty
    }
    props(j \ "defaults") ++ props(j \ "overrides")
  }

  /** `GET /v1/namespaces` — top-level namespace names (multi-level
    * namespaces come back dot-joined). */
  def listNamespaces(endpoint: String, token: Option[String] = None)
      : Seq[String] = {
    val j = get(endpoint, "/v1/namespaces", token)
    (j \ "namespaces") match {
      case JArray(nss) => nss.collect {
        case JArray(parts) => parts.collect { case JString(p) => p }
          .mkString(".")
      }
      case _ => Seq.empty
    }
  }

  /** `GET /v1/namespaces/{ns}/tables` — table names in `ns`. */
  def listTables(endpoint: String, ns: String,
      token: Option[String] = None): Seq[String] = {
    val j = get(endpoint, s"/v1/namespaces/${encodeNs(ns)}/tables", token)
    (j \ "identifiers") match {
      case JArray(ids) => ids.flatMap(i => (i \ "name") match {
        case JString(n) => Some(n)
        case _ => None
      })
      case _ => Seq.empty
    }
  }

  /** `GET /v1/namespaces/{ns}/tables/{table}` — the LoadTableResult.
    * `metadata-location` is required by the spec for loads; `metadata`
    * (the inlined document) is optional — servers that omit it leave
    * the caller to read the location. */
  def loadTable(endpoint: String, ns: String, table: String,
      token: Option[String] = None): LoadedTable = {
    val j = get(endpoint,
      s"/v1/namespaces/${encodeNs(ns)}/tables/${enc(table)}", token)
    val loc = (j \ "metadata-location") match {
      case JString(l) => l
      case _ => throw new IllegalArgumentException(
        s"REST catalog: LoadTableResult for $ns.$table carries no " +
          "metadata-location — cannot adopt a table without its " +
          "metadata document")
    }
    val inline = (j \ "metadata") match {
      case JNothing | JNull => None
      case m => Some(m)
    }
    LoadedTable(loc, inline)
  }
}
