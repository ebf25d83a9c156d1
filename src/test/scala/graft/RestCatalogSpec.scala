package graft

import java.nio.file.{Files, Path}

import graft.catalog.Snaplog
import graft.interop.{IcebergExport, IcebergImport, RestCatalog, RestServe}
import graft.table.LakehouseTable

/** Iceberg REST-catalog interop, BOTH halves against each other:
  * [[RestServe]] publishes an exported tree over the spec's read
  * endpoints (the modern deployment shape — the catalog serves
  * metadata POINTERS, manifests/data stay on storage), [[RestCatalog]]
  * is the client, and graft adopts + refreshes through it. The server
  * re-reads version-hint per request, so a client always sees the
  * tree's CURRENT pointer, exactly like a live catalog service
  * fronting a writer. */
class RestCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = Seq(
    (1, "A", 1.5), (2, "B", 2.5), (3, "B", 3.5), (4, "C", 4.5))
    .toDF("id", "group", "v")

  private def serve(tree: Path, ns: String, name: String,
      requireToken: Option[String] = None,
      inlineMetadata: Boolean = false): (String, () => Unit) = {
    val srv = RestServe.start(Map((ns, name) -> tree),
      token = requireToken, inlineMetadata = inlineMetadata)
    (srv.endpoint, () => srv.stop())
  }

  test("REST client: config, namespaces, tables, loadTable (both payload shapes)") {
    val wh = Files.createTempDirectory("graft-rest-client").toString
    val cat = new Snaplog(wh)
    val src = LakehouseTable.create(cat, spark, "ns", "rc", fixture().schema)
    src.append(fixture())
    val dest = Files.createTempDirectory("graft-rest-client-ice")
    IcebergExport.export(src, dest)
    val (ep, stop) = serve(dest, "extns", "rc")
    try {
      assert(RestCatalog.config(ep) == Map.empty)
      assert(RestCatalog.listNamespaces(ep) == Seq("extns"))
      assert(RestCatalog.listTables(ep, "extns") == Seq("rc"))
      val lt = RestCatalog.loadTable(ep, "extns", "rc")
      assert(lt.metadata.isEmpty &&
        lt.metadataLocation.endsWith("v1.metadata.json"))
      val e = intercept[IllegalArgumentException](
        RestCatalog.loadTable(ep, "extns", "nope"))
      assert(e.getMessage.contains("404"), e.getMessage)
    } finally stop()
    val (ep2, stop2) = serve(dest, "extns", "rc", inlineMetadata = true)
    try assert(RestCatalog.loadTable(ep2, "extns", "rc").metadata.isDefined)
    finally stop2()
  }

  test("adopt + refresh a live table THROUGH the REST catalog") {
    val wh = Files.createTempDirectory("graft-rest-adopt").toString
    val cat = new Snaplog(wh)
    val src = LakehouseTable.create(cat, spark, "ns", "rsrc", fixture().schema)
    src.append(fixture())
    val dest = Files.createTempDirectory("graft-rest-adopt-ice")
    IcebergExport.export(src, dest)
    val (ep, stop) = serve(dest, "extns", "rsrc")
    try {
      val imp = IcebergImport.registerFromRest(
        cat, spark, ep, "extns", "rsrc", "ns", "rmirror")
      assert(imp.table.scan().count() == 4)
      // the stored ref is the ENDPOINT, not a frozen metadata file
      assert(cat.loadTable("ns", "rmirror").properties
        .get(IcebergImport.ImportedFromProp).exists(_.startsWith("rest:")))
      // the source lives on: append + eq delete, new metadata version —
      // refresh must re-fetch the catalog's CURRENT pointer
      src.append(fixture().withColumn("id", $"id" + 10))
      src.deleteEq("group", Seq("C"))
      IcebergExport.export(src, dest)
      val r = IcebergImport.refresh(
        cat, spark, "ns", "rmirror", perSnapshot = true)
      assert(!r.reset && r.commits == 2, r.toString)
      assert(r.table.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq
        == src.scan().select("id").collect().map(_.getInt(0)).sorted.toSeq)
      // idempotent no-op against the unchanged catalog answer
      assert(IcebergImport.refresh(cat, spark, "ns", "rmirror")
        .snapshot.isEmpty)
    } finally stop()
  }

  test("bearer-token auth: rejected without, accepted with; never persisted") {
    val wh = Files.createTempDirectory("graft-rest-auth").toString
    val cat = new Snaplog(wh)
    val src = LakehouseTable.create(cat, spark, "ns", "asrc", fixture().schema)
    src.append(fixture())
    val dest = Files.createTempDirectory("graft-rest-auth-ice")
    IcebergExport.export(src, dest)
    val (ep, stop) = serve(dest, "extns", "asrc",
      requireToken = Some("sesame"))
    try {
      val e = intercept[IllegalArgumentException](
        IcebergImport.registerFromRest(
          cat, spark, ep, "extns", "asrc", "ns", "amirror"))
      assert(e.getMessage.contains("401"), e.getMessage)
      val imp = IcebergImport.registerFromRest(
        cat, spark, ep, "extns", "asrc", "ns", "amirror",
        token = Some("sesame"))
      assert(imp.table.scan().count() == 4)
      // the token is a per-call secret, never written into properties
      assert(!cat.loadTable("ns", "amirror").properties.values
        .exists(_.contains("sesame")))
      // refresh re-supplies it per call
      src.append(fixture().withColumn("id", $"id" + 10))
      IcebergExport.export(src, dest)
      val denied = intercept[IllegalArgumentException](
        IcebergImport.refresh(cat, spark, "ns", "amirror"))
      assert(denied.getMessage.contains("401"), denied.getMessage)
      val r = IcebergImport.refresh(cat, spark, "ns", "amirror",
        token = Some("sesame"))
      assert(r.dataFilesAdded >= 1)
      assert(r.table.scan().count() == 8)
    } finally stop()
  }
}
