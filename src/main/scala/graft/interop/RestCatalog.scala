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
  *  - Auth is either a STATIC bearer token (the spec's
  *    `Authorization: Bearer` header, pre-issued) or the spec's OAuth2
  *    CLIENT-CREDENTIALS exchange (`POST /v1/oauth/tokens` — the
  *    common Polaris/Tabular/Gravitino deployment): the access token
  *    is fetched lazily, held in MEMORY only (never persisted into
  *    table properties — a refresh re-supplies credentials per call),
  *    and transparently re-fetched ONCE when a request answers 401
  *    (token expiry), then the request retries.
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

  /** Credential shapes ([[NoAuth]] / [[StaticBearer]] /
    * [[ClientCredentials]]); see the object doc for the contract. */
  sealed trait Auth
  case object NoAuth extends Auth
  final case class StaticBearer(token: String) extends Auth
  /** OAuth2 client-credentials, spec §`POST /v1/oauth/tokens`
    * (`grant_type=client_credentials`, form-encoded). The instance
    * CACHES its current access token — share one instance across
    * register + refresh calls so a still-valid token is reused, and a
    * refresh serves every holder at once. Expiry is PROACTIVE (round
    * 16): the token response's `expires_in` (RFC 6749 §5.1) is
    * honored — a token within [[RestCatalog.ExpirySkewMs]] of its
    * deadline re-exchanges BEFORE the request goes out, so a
    * long-lived client never eats a 401-and-retry per expiry. The 401
    * retry stays as the fallback for servers that revoke early or
    * omit `expires_in`. */
  final class ClientCredentials(
      private[interop] val clientId: String,
      private[interop] val clientSecret: String,
      private[interop] val scope: String = "catalog") extends Auth {
    /** (access token, epoch-ms deadline; Long.MaxValue = no expiry). */
    @volatile private[interop] var cached: Option[(String, Long)] = None
  }
  object ClientCredentials {
    def apply(clientId: String, clientSecret: String,
        scope: String = "catalog"): ClientCredentials =
      new ClientCredentials(clientId, clientSecret, scope)
  }

  private[interop] def fromToken(token: Option[String]): Auth =
    token.map(StaticBearer(_): Auth).getOrElse(NoAuth)

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

  /** Refresh this many ms BEFORE a token's `expires_in` deadline — one
    * request's worth of clock skew and transit time. */
  private[interop] val ExpirySkewMs = 30000L

  /** `POST /v1/oauth/tokens` — the spec's client-credentials exchange.
    * Form-encoded per RFC 6749 §4.4; the response's `access_token` is
    * cached on the credentials instance (memory only) together with
    * its `expires_in`-derived deadline (absent → no deadline). */
  private def fetchToken(endpoint: String,
      cc: ClientCredentials): (String, Long) = {
    val base = endpoint.stripSuffix("/")
    val form = Seq(
      "grant_type" -> "client_credentials",
      "client_id" -> cc.clientId,
      "client_secret" -> cc.clientSecret,
      "scope" -> cc.scope)
      .map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    val req = HttpRequest.newBuilder(
        java.net.URI.create(s"$base/v1/oauth/tokens"))
      .timeout(java.time.Duration.ofSeconds(60))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .header("Accept", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(form))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new IllegalArgumentException(
        s"REST catalog $base/v1/oauth/tokens: HTTP ${resp.statusCode()} — " +
          s"token exchange refused: ${resp.body().take(500)}")
    val body = JsonMethods.parse(resp.body())
    val token = (body \ "access_token") match {
      case JString(t) if t.nonEmpty => t
      case _ => throw new IllegalArgumentException(
        s"REST catalog $base/v1/oauth/tokens: token response carries no " +
          s"access_token — ${resp.body().take(500)}")
    }
    // expires_in is seconds-from-now (RFC 6749 §5.1), optional; a
    // server may also send it as a JSON string — accept both
    val deadline = ((body \ "expires_in") match {
      case JInt(s) => Some(s.toLong)
      case JLong(s) => Some(s)
      case JDouble(s) => Some(s.toLong)
      case JString(s) => s.toLongOption
      case _ => None
    }).filter(_ > 0)
      .map(s => System.currentTimeMillis() + s * 1000L)
      .getOrElse(Long.MaxValue)
    (token, deadline)
  }

  private def bearerFor(endpoint: String, auth: Auth,
      forceRefresh: Boolean): Option[String] = auth match {
    case NoAuth => None
    case StaticBearer(t) => Some(t)
    case cc: ClientCredentials =>
      def stale(c: Option[(String, Long)]): Boolean = c.forall {
        case (_, deadline) =>
          deadline != Long.MaxValue &&
            System.currentTimeMillis() >= deadline - ExpirySkewMs
      }
      if (forceRefresh || stale(cc.cached))
        cc.synchronized {
          if (forceRefresh || stale(cc.cached))
            cc.cached = Some(fetchToken(endpoint, cc))
        }
      cc.cached.map(_._1)
  }

  private def get(endpoint: String, path: String,
      auth: Auth): JValue = {
    val base = endpoint.stripSuffix("/")
    def send(bearer: Option[String]): HttpResponse[String] = {
      var b = HttpRequest.newBuilder(java.net.URI.create(s"$base$path"))
        .timeout(java.time.Duration.ofSeconds(60))
        .header("Accept", "application/json")
        .GET()
      bearer.foreach(t => b = b.header("Authorization", s"Bearer $t"))
      client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    }
    var resp = send(bearerFor(endpoint, auth, forceRefresh = false))
    // an expired client-credentials token re-authenticates ONCE and
    // retries; a static bearer has nothing to refresh
    if (resp.statusCode() == 401 && auth.isInstanceOf[ClientCredentials])
      resp = send(bearerFor(endpoint, auth, forceRefresh = true))
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
      : Map[String, String] = config(endpoint, fromToken(token))

  def config(endpoint: String, auth: Auth): Map[String, String] = {
    val j = get(endpoint, "/v1/config", auth)
    def props(v: JValue): Map[String, String] = v match {
      case JObject(fs) => fs.collect { case (k, JString(s)) => k -> s }.toMap
      case _ => Map.empty
    }
    props(j \ "defaults") ++ props(j \ "overrides")
  }

  /** `GET /v1/namespaces` — top-level namespace names (multi-level
    * namespaces come back dot-joined). */
  def listNamespaces(endpoint: String, token: Option[String] = None)
      : Seq[String] = listNamespaces(endpoint, fromToken(token))

  def listNamespaces(endpoint: String, auth: Auth): Seq[String] = {
    val j = get(endpoint, "/v1/namespaces", auth)
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
      token: Option[String] = None): Seq[String] =
    listTables(endpoint, ns, fromToken(token))

  def listTables(endpoint: String, ns: String, auth: Auth): Seq[String] = {
    val j = get(endpoint, s"/v1/namespaces/${encodeNs(ns)}/tables", auth)
    (j \ "identifiers") match {
      case JArray(ids) => ids.flatMap(i => (i \ "name") match {
        case JString(n) => Some(n)
        case _ => None
      })
      case _ => Seq.empty
    }
  }

  /** `POST /v1/namespaces/{ns}/tables/{table}` — the spec's commit
    * route (CommitTableRequest: `requirements` + `updates`), round 17:
    * the WRITE half of the REST interop. The server checks every
    * requirement against its current state and applies the updates as
    * ONE atomic commit; a failed requirement answers the spec's 409,
    * which this client surfaces as graft's own
    * [[graft.catalog.CommitConflictException]] — the same exception a
    * native conditional commit throws, so retry loops treat local and
    * REST conflicts identically. Other non-2xx answers refuse loudly
    * with status + body. Returns the CommitTableResponse's metadata
    * (location + inlined document when the server sends it). */
  private def postJson(endpoint: String, path: String, body: JValue,
      auth: Auth): HttpResponse[String] = {
    val base = endpoint.stripSuffix("/")
    val payload = JsonMethods.compact(JsonMethods.render(body))
    def send(bearer: Option[String]): HttpResponse[String] = {
      var b = HttpRequest.newBuilder(java.net.URI.create(s"$base$path"))
        .timeout(java.time.Duration.ofSeconds(120))
        .header("Accept", "application/json")
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(payload))
      bearer.foreach(t => b = b.header("Authorization", s"Bearer $t"))
      client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    }
    var resp = send(bearerFor(endpoint, auth, forceRefresh = false))
    if (resp.statusCode() == 401 && auth.isInstanceOf[ClientCredentials])
      resp = send(bearerFor(endpoint, auth, forceRefresh = true))
    resp
  }

  private def loadedFrom(resp: HttpResponse[String], what: String): LoadedTable = {
    val j = JsonMethods.parse(resp.body())
    val loc = (j \ "metadata-location") match {
      case JString(l) => l
      case _ => throw new IllegalArgumentException(
        s"REST catalog: $what carries no metadata-location — " +
          s"${resp.body().take(500)}")
    }
    val inline = (j \ "metadata") match {
      case JNothing | JNull => None
      case m => Some(m)
    }
    LoadedTable(loc, inline)
  }

  def commitTable(endpoint: String, ns: String, table: String,
      body: JValue, auth: Auth = NoAuth): LoadedTable = {
    val path = s"/v1/namespaces/${encodeNs(ns)}/tables/${enc(table)}"
    val resp = postJson(endpoint, path, body, auth)
    resp.statusCode() match {
      case ok if ok >= 200 && ok < 300 =>
        loadedFrom(resp, s"CommitTableResponse for $ns.$table")
      case 409 => throw new graft.catalog.CommitConflictException(
        s"REST commit to $ns.$table conflicted (409) — a requirement " +
          s"failed against the server's current state: " +
          s"${resp.body().take(500)}")
      case other => throw new IllegalArgumentException(
        s"REST catalog $path: HTTP $other — ${resp.body().take(500)}")
    }
  }

  /** `POST /v1/namespaces/{ns}/tables` — the spec's CREATE route
    * (round 17): create a table through a graft catalog server that
    * accepts creates ([[RestServe.CreateTarget]]). The request carries
    * the spec's shapes end to end — schema as Iceberg JSON (nested
    * types included), partition spec as transform + source-id fields
    * (identity / time transforms / truncate; graft refuses bucket —
    * its xxhash64 buckets are not murmur3), properties verbatim. An
    * existing table answers the spec's 409, surfaced as
    * IllegalStateException to match the native catalog's createTable
    * contract. Returns the fresh (empty) table's LoadTableResult. */
  def createTable(endpoint: String, ns: String, name: String,
      schema: org.apache.spark.sql.types.StructType,
      partitionColumns: Seq[String] = Seq.empty,
      properties: Map[String, String] = Map.empty,
      auth: Auth = NoAuth): LoadedTable = {
    import org.json4s.JsonDSL._
    val srcId: Map[String, Int] = schema.fieldNames.zipWithIndex
      .map { case (n, i) => n.toLowerCase(java.util.Locale.ROOT) -> (i + 1) }
      .toMap
    val partFields = graft.table.PartitionTransforms.parseAll(partitionColumns)
      .zipWithIndex.map { case (pf, i) =>
        val transform = pf match {
          case _: graft.table.IdentityField => "identity"
          case _: graft.table.DaysField => "day"
          case _: graft.table.HoursField => "hour"
          case _: graft.table.MonthsField => "month"
          case _: graft.table.YearsField => "year"
          case t: graft.table.TruncateField => s"truncate[${t.width}]"
          case other => throw new IllegalArgumentException(
            s"partition transform '$other' does not create over REST — " +
              "graft buckets (xxhash64) have no spec transform; create " +
              "bucket-partitioned tables through graft directly")
        }
        val sid = srcId.getOrElse(
          pf.source.toLowerCase(java.util.Locale.ROOT),
          throw new IllegalArgumentException(
            s"partition source '${pf.source}' not in schema"))
        ("name" -> pf.fieldName) ~ ("transform" -> transform) ~
          ("source-id" -> sid) ~ ("field-id" -> (1000 + i)): JValue
      }
    val body: JValue =
      ("name" -> name) ~
        ("schema" -> IcebergExport.plainSchemaJson(schema)) ~
        ("partition-spec" ->
          (("spec-id" -> 0) ~ ("fields" -> JArray(partFields.toList)))) ~
        ("properties" -> JObject(properties.toList.map {
          case (k, v) => k -> (JString(v): JValue)
        }))
    val resp = postJson(endpoint,
      s"/v1/namespaces/${encodeNs(ns)}/tables", body, auth)
    resp.statusCode() match {
      case ok if ok >= 200 && ok < 300 =>
        loadedFrom(resp, s"LoadTableResult for created $ns.$name")
      case 409 => throw new IllegalStateException(
        s"REST create of $ns.$name: table already exists (409) — " +
          s"${resp.body().take(500)}")
      case other => throw new IllegalArgumentException(
        s"REST catalog create $ns.$name: HTTP $other — " +
          s"${resp.body().take(500)}")
    }
  }

  /** APPEND staged parquet files to a served table through the REST
    * commit route — the client half of "a foreign engine commits
    * through graft's catalog server". Spec-shaped end to end: the
    * helper writes a real Iceberg data manifest + manifest list under
    * `stagingDir` (Avro, the export's spec field ids) and POSTs
    * `add-snapshot` + `set-snapshot-ref main` guarded by
    * `assert-ref-snapshot-id` (`expectedSnapshotId`; `Some(0)` =
    * "table must still be empty", `None` = blind append). The server
    * re-derives authoritative per-file statistics from the parquet
    * footers, so `files` only needs path + row count + size (e.g. from
    * `FileStats.statAll`) — and the manifest's partition struct is
    * written EMPTY, which the server records as unattributed (reads
    * stay exact; metadata pruning just can't skip these files). A
    * partition-attributed foreign writer includes the values in its
    * own manifests; this helper refuses entries carrying partition
    * values rather than silently dropping the attribution.
    *
    * The proposed `snapshot-id` in the request is ADVISORY: graft
    * assigns its own dense monotonic id at commit (recorded in the
    * response metadata; the client-proposed id lands in the commit
    * summary) — spec clients re-read identity from the returned
    * metadata, never from their proposal. */
  def commitAppend(endpoint: String, ns: String, table: String,
      files: Seq[graft.catalog.DataFileEntry],
      stagingDir: java.nio.file.Path,
      expectedSnapshotId: Option[Long],
      auth: Auth = NoAuth): LoadedTable = {
    require(files.nonEmpty, "REST append: no files to commit")
    require(files.forall(f => !f.deleteFile.contains(true)),
      "REST append: delete files do not commit through this route")
    require(files.forall(_.partitionValues.isEmpty),
      "REST append: partition-attributed entries need a writer that " +
        "emits the manifest partition struct — this helper writes it " +
        "empty (unattributed) and refuses rather than drop attribution")
    java.nio.file.Files.createDirectories(stagingDir)
    val proposed = expectedSnapshotId.map(_ + 1)
      .getOrElse(System.currentTimeMillis())
    val entrySchema = IcebergExport.manifestEntrySchema(Seq.empty)
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()
    val records = files.map { f =>
      val df = new org.apache.avro.generic.GenericData.Record(dataFileSchema)
      df.put("content", 0)
      df.put("file_path", f.path)
      df.put("file_format", "PARQUET")
      df.put("partition",
        new org.apache.avro.generic.GenericData.Record(partSchema))
      df.put("record_count", f.rowCount)
      df.put("file_size_in_bytes", f.sizeBytes)
      df.put("equality_ids", null)
      val e = new org.apache.avro.generic.GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", java.lang.Long.valueOf(proposed))
      e.put("sequence_number", null)      // inherited from the commit
      e.put("file_sequence_number", null)
      e.put("data_file", df)
      e
    }
    val mfPath = stagingDir.resolve(s"rest-manifest-$proposed.avro")
    IcebergExport.writeAvro(mfPath, entrySchema,
      Seq("format-version" -> "2", "content" -> "data",
        "partition-spec" -> "[]", "partition-spec-id" -> "0"),
      records)
    val mf = new org.apache.avro.generic.GenericData.Record(
      IcebergExport.ManifestFileSchema)
    mf.put("manifest_path", mfPath.toString)
    mf.put("manifest_length", java.nio.file.Files.size(mfPath))
    mf.put("partition_spec_id", 0)
    mf.put("content", 0)
    mf.put("sequence_number", 0L)     // assigned by the committing catalog
    mf.put("min_sequence_number", 0L)
    mf.put("added_snapshot_id", proposed)
    mf.put("added_files_count", files.size)
    mf.put("existing_files_count", 0)
    mf.put("deleted_files_count", 0)
    mf.put("added_rows_count", files.map(_.rowCount).sum)
    mf.put("existing_rows_count", 0L)
    mf.put("deleted_rows_count", 0L)
    val listPath = stagingDir.resolve(s"rest-snap-$proposed.manifest-list.avro")
    IcebergExport.writeAvro(listPath, IcebergExport.ManifestFileSchema,
      Seq("snapshot-id" -> proposed.toString, "format-version" -> "2"),
      Seq(mf))
    import org.json4s.JsonDSL._
    // the spec encodes "ref must not exist yet" as snapshot-id null —
    // graft's expect-empty (Some(0)) maps onto exactly that
    val requirements: List[JValue] = expectedSnapshotId.toList.map { want =>
      ("type" -> "assert-ref-snapshot-id") ~ ("ref" -> "main") ~
        ("snapshot-id" -> (if (want == 0L) JNull else JLong(want): JValue))
    }
    val body: JValue =
      ("requirements" -> JArray(requirements)) ~
      ("updates" -> JArray(List(
        ("action" -> "add-snapshot") ~ ("snapshot" ->
          (("snapshot-id" -> proposed) ~
            ("timestamp-ms" -> System.currentTimeMillis()) ~
            ("summary" -> (("operation" -> "append"): JValue)) ~
            ("manifest-list" -> listPath.toString))),
        ("action" -> "set-snapshot-ref") ~ ("ref-name" -> "main") ~
          ("snapshot-ref" ->
            (("type" -> "branch") ~ ("snapshot-id" -> proposed))))))
    commitTable(endpoint, ns, table, body, auth)
  }

  /** COMMIT a merge-on-read DELETE snapshot through the REST route —
    * the CDC writer's retraction commit (round 17). `posFiles` are
    * spec position-delete parquet files ((file_path, pos) rows,
    * unscoped); `eqFiles` pair an unscoped equality-delete parquet
    * with its `equality_ids` (the TARGET table's field ids — read them
    * from the loaded metadata; fresh graft tables number top-level
    * fields 1..n in schema order). Exactly one kind per commit, the
    * server's contract. The helper writes the spec delete manifest +
    * manifest list under `stagingDir` and POSTs `add-snapshot` with
    * operation `delete` guarded by `assert-ref-snapshot-id`; a stale
    * expectation — or a position delete referencing a file the current
    * snapshot no longer holds — surfaces as
    * [[graft.catalog.CommitConflictException]]. */
  def commitDelete(endpoint: String, ns: String, table: String,
      posFiles: Seq[graft.catalog.DataFileEntry] = Seq.empty,
      eqFiles: Seq[(graft.catalog.DataFileEntry, Seq[Int])] = Seq.empty,
      stagingDir: java.nio.file.Path = null,
      expectedSnapshotId: Option[Long] = None,
      auth: Auth = NoAuth): LoadedTable = {
    require(stagingDir != null, "REST delete: stagingDir is required")
    require(posFiles.nonEmpty ^ eqFiles.nonEmpty,
      "REST delete: exactly one delete kind per commit (position OR " +
        "equality files)")
    java.nio.file.Files.createDirectories(stagingDir)
    val proposed = expectedSnapshotId.map(_ + 1)
      .getOrElse(System.currentTimeMillis())
    val entrySchema = IcebergExport.manifestEntrySchema(Seq.empty)
    val dataFileSchema = entrySchema.getField("data_file").schema()
    val partSchema = dataFileSchema.getField("partition").schema()
    // equality_ids is union(null, array<int>) — the array branch
    val eqIdsSchema = dataFileSchema.getField("equality_ids").schema()
      .getTypes.get(1)
    import scala.jdk.CollectionConverters._
    def entry(f: graft.catalog.DataFileEntry, content: Int,
        ids: Option[Seq[Int]]): org.apache.avro.generic.GenericRecord = {
      val df = new org.apache.avro.generic.GenericData.Record(dataFileSchema)
      df.put("content", content)
      df.put("file_path", f.path)
      df.put("file_format", "PARQUET")
      df.put("partition",
        new org.apache.avro.generic.GenericData.Record(partSchema))
      df.put("record_count", f.rowCount)
      df.put("file_size_in_bytes", f.sizeBytes)
      df.put("equality_ids", ids.map(seq =>
        new org.apache.avro.generic.GenericData.Array[Integer](eqIdsSchema,
          seq.map(Integer.valueOf).asJava)).orNull)
      val e = new org.apache.avro.generic.GenericData.Record(entrySchema)
      e.put("status", 1) // ADDED
      e.put("snapshot_id", java.lang.Long.valueOf(proposed))
      e.put("sequence_number", null)
      e.put("file_sequence_number", null)
      e.put("data_file", df)
      e
    }
    val records =
      posFiles.map(f => entry(f, 1, None)) ++
        eqFiles.map { case (f, ids) => entry(f, 2, Some(ids)) }
    val mfPath = stagingDir.resolve(s"rest-del-manifest-$proposed.avro")
    IcebergExport.writeAvro(mfPath, entrySchema,
      Seq("format-version" -> "2", "content" -> "deletes",
        "partition-spec" -> "[]", "partition-spec-id" -> "0"),
      records)
    val mf = new org.apache.avro.generic.GenericData.Record(
      IcebergExport.ManifestFileSchema)
    mf.put("manifest_path", mfPath.toString)
    mf.put("manifest_length", java.nio.file.Files.size(mfPath))
    mf.put("partition_spec_id", 0)
    mf.put("content", 1) // delete manifest
    mf.put("sequence_number", 0L)
    mf.put("min_sequence_number", 0L)
    mf.put("added_snapshot_id", proposed)
    mf.put("added_files_count", records.size)
    mf.put("existing_files_count", 0)
    mf.put("deleted_files_count", 0)
    mf.put("added_rows_count",
      (posFiles ++ eqFiles.map(_._1)).map(_.rowCount).sum)
    mf.put("existing_rows_count", 0L)
    mf.put("deleted_rows_count", 0L)
    val listPath = stagingDir.resolve(
      s"rest-del-snap-$proposed.manifest-list.avro")
    IcebergExport.writeAvro(listPath, IcebergExport.ManifestFileSchema,
      Seq("snapshot-id" -> proposed.toString, "format-version" -> "2"),
      Seq(mf))
    import org.json4s.JsonDSL._
    val requirements: List[JValue] = expectedSnapshotId.toList.map { want =>
      ("type" -> "assert-ref-snapshot-id") ~ ("ref" -> "main") ~
        ("snapshot-id" -> (if (want == 0L) JNull else JLong(want): JValue))
    }
    val body: JValue =
      ("requirements" -> JArray(requirements)) ~
      ("updates" -> JArray(List(
        ("action" -> "add-snapshot") ~ ("snapshot" ->
          (("snapshot-id" -> proposed) ~
            ("timestamp-ms" -> System.currentTimeMillis()) ~
            ("summary" -> (("operation" -> "delete"): JValue)) ~
            ("manifest-list" -> listPath.toString))),
        ("action" -> "set-snapshot-ref") ~ ("ref-name" -> "main") ~
          ("snapshot-ref" ->
            (("type" -> "branch") ~ ("snapshot-id" -> proposed))))))
    commitTable(endpoint, ns, table, body, auth)
  }

  /** `POST /v1/namespaces` — create a namespace in a catalog server
    * that manages its catalog over REST ([[RestServe.CreateTarget]]).
    * An existing namespace answers the spec's 409, surfaced as
    * IllegalStateException. */
  def createNamespace(endpoint: String, ns: String,
      auth: Auth = NoAuth): Unit = {
    import org.json4s.JsonDSL._
    val body: JValue =
      ("namespace" -> ns.split('.').toList) ~
        ("properties" -> JObject(Nil))
    val resp = postJson(endpoint, "/v1/namespaces", body, auth)
    resp.statusCode() match {
      case ok if ok >= 200 && ok < 300 => ()
      case 409 => throw new IllegalStateException(
        s"REST create of namespace $ns: already exists (409) — " +
          s"${resp.body().take(500)}")
      case other => throw new IllegalArgumentException(
        s"REST catalog create namespace $ns: HTTP $other — " +
          s"${resp.body().take(500)}")
    }
  }

  /** `GET /v1/namespaces/{ns}` — the spec's namespace existence/
    * metadata probe: true on 200, false on 404, loud otherwise. */
  def namespaceExists(endpoint: String, ns: String,
      auth: Auth = NoAuth): Boolean =
    try { get(endpoint, s"/v1/namespaces/${encodeNs(ns)}", auth); true }
    catch {
      case e: IllegalArgumentException if e.getMessage.contains("(404)") =>
        false
    }

  /** `DELETE /v1/namespaces/{ns}/tables/{table}` — the spec's drop
    * route (round 17): drop a table a graft catalog server MANAGES
    * (created-through-REST lifecycle, [[RestServe.CreateTarget]]).
    * 204 on success; 404 refuses loudly; servers without a
    * CreateTarget answer 405. */
  def dropTable(endpoint: String, ns: String, table: String,
      auth: Auth = NoAuth): Unit = {
    val base = endpoint.stripSuffix("/")
    val path = s"/v1/namespaces/${encodeNs(ns)}/tables/${enc(table)}"
    def send(bearer: Option[String]): HttpResponse[String] = {
      var b = HttpRequest.newBuilder(java.net.URI.create(s"$base$path"))
        .timeout(java.time.Duration.ofSeconds(60))
        .header("Accept", "application/json")
        .DELETE()
      bearer.foreach(t => b = b.header("Authorization", s"Bearer $t"))
      client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    }
    var resp = send(bearerFor(endpoint, auth, forceRefresh = false))
    if (resp.statusCode() == 401 && auth.isInstanceOf[ClientCredentials])
      resp = send(bearerFor(endpoint, auth, forceRefresh = true))
    resp.statusCode() match {
      case ok if ok >= 200 && ok < 300 => ()
      case other => throw new IllegalArgumentException(
        s"REST catalog $base$path: HTTP $other — ${resp.body().take(500)}")
    }
  }

  /** `GET /v1/namespaces/{ns}/tables/{table}` — the LoadTableResult.
    * `metadata-location` is required by the spec for loads; `metadata`
    * (the inlined document) is optional — servers that omit it leave
    * the caller to read the location. */
  def loadTable(endpoint: String, ns: String, table: String,
      token: Option[String] = None): LoadedTable =
    loadTable(endpoint, ns, table, fromToken(token))

  def loadTable(endpoint: String, ns: String, table: String,
      auth: Auth): LoadedTable = {
    val j = get(endpoint,
      s"/v1/namespaces/${encodeNs(ns)}/tables/${enc(table)}", auth)
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
