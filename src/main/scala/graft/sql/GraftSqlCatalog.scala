package graft.sql

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, SupportsRead, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.catalog.{Catalog, DataFileEntry, JdbcCatalog, Snaplog}

/** Read-only snaplog-backed DSv2 table. Scanning delegates to Spark's
  * vectorized parquet DSv2, but the FILE LIST is pruned first from log
  * metadata — identity-partition values and per-file column [min,max]
  * bounds — so files that cannot match the pushed predicates are never
  * handed to Spark at all (Iceberg-manifest-style planning; at 100 TB
  * the difference between planning over a partition and planning over
  * the table). Advertises NO write capability: `INSERT INTO` through
  * the SQL catalog would append parquet behind the snapshot log's back
  * (no commit, no atomicity), so it must not plan at all. */
private[sql] final class GraftSqlTable(
    tableName: String,
    tableSchema: StructType,
    files: Seq[DataFileEntry]) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableName, tableSchema, files, options)
}

/** ScanBuilder that (1) prunes the file list from log metadata using
  * the pushed predicates, then (2) hands the survivors to a fresh
  * ParquetScanBuilder, forwarding the same predicates so parquet
  * footer / row-group skipping still applies downstream. Every filter
  * is also kept as a residual (returned from `pushFilters`), so
  * metadata pruning is purely an optimization — row-level evaluation
  * still happens and a stats bug cannot change results. Implements the
  * same catalyst-filter pushdown interface FileScanBuilder does, so
  * the planner treats it exactly like a file-source builder. */
private[sql] final class GraftScanBuilder(
    tableName: String,
    tableSchema: StructType,
    files: Seq[DataFileEntry],
    options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with SupportsPushDownRequiredColumns {

  import org.apache.spark.sql.connector.expressions.NamedReference
  import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}

  private var exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Seq.empty
  private var required: StructType = tableSchema
  private var pushedAgg: Option[Aggregation] = None

  override def pushFilters(
      filters: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    exprs = filters
    filters // all residual: pruning never replaces row-level evaluation
  }

  // file pruning is reported by the delegated ParquetScan's own
  // pushed-filter metadata; nothing extra to surface here
  override def pushedFilters: Array[org.apache.spark.sql.connector.expressions.filter.Predicate] =
    Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // ---- metadata-only aggregates ------------------------------------------
  // COUNT(*)/MIN/MAX over an unfiltered table are already IN the
  // snapshot log (row counts and column bounds per file), so the whole
  // query answers from metadata without opening a single data file —
  // the Iceberg manifest-aggregate optimization, and at 100 TB the
  // difference between a free answer and a full table scan. Strictly
  // conservative: any pushed filter, grouping, unsupported function or
  // column lacking bounds in ANY file declines the pushdown and Spark
  // plans the ordinary scan.

  /** Numeric stat types the log records losslessly round-trippable
    * bounds for. Strings are excluded on purpose: parquet orders them
    * as UTF-8 bytes while java.lang.String compares UTF-16 chars, and
    * the two disagree on supplementary characters. */
  private def statType(c: String): Option[org.apache.spark.sql.types.DataType] =
    tableSchema.fields.find(_.name == c).map(_.dataType).filter {
      case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.FloatType | org.apache.spark.sql.types.DoubleType => true
      case _ => false
    }

  private def boundedCol(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        val c = nr.fieldNames()(0)
        if (statType(c).isDefined &&
          files.forall(_.columnStats.exists(_.contains(c)))) Some(c) else None
      case _ => None
    }

  private def canAnswerFromMetadata(agg: Aggregation): Boolean =
    exprs.isEmpty && agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => files.isEmpty || boundedCol(m.column).isDefined
        case m: Max => files.isEmpty || boundedCol(m.column).isDefined
        case _ => false
      }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    canAnswerFromMetadata(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    canAnswerFromMetadata(agg) && { pushedAgg = Some(agg); true }

  private def parse(c: String, s: String): Any = statType(c).get match {
    case org.apache.spark.sql.types.IntegerType => s.toLong.toInt
    case org.apache.spark.sql.types.LongType => s.toLong
    case org.apache.spark.sql.types.FloatType => s.toDouble.toFloat
    case org.apache.spark.sql.types.DoubleType => s.toDouble
    case other => throw new IllegalStateException(s"unexpected stat type $other")
  }

  private def metadataAggScan(agg: Aggregation): Scan = {
    import org.apache.spark.sql.types._
    val (values, fields) = agg.aggregateExpressions.zipWithIndex.map {
      case (_: CountStar, i) =>
        (files.map(_.rowCount).sum: Any, StructField(s"count_$i", LongType, nullable = false))
      case (m: Min, i) =>
        val c = boundedCol(m.column).getOrElse("")
        val v = if (files.isEmpty) null
          else files.flatMap(_.columnStats.flatMap(_.get(c)))
            .map(b => parse(c, b.min)).reduce((x, y) => if (lt(y, x)) y else x)
        (v: Any, StructField(s"min_$i", statType(c).getOrElse(NullType), nullable = true))
      case (m: Max, i) =>
        val c = boundedCol(m.column).getOrElse("")
        val v = if (files.isEmpty) null
          else files.flatMap(_.columnStats.flatMap(_.get(c)))
            .map(b => parse(c, b.max)).reduce((x, y) => if (lt(x, y)) y else x)
        (v: Any, StructField(s"max_$i", statType(c).getOrElse(NullType), nullable = true))
      case (other, _) =>
        throw new IllegalStateException(s"unanswerable aggregate $other")
    }.unzip
    val schema = StructType(fields.toIndexedSeq)
    val row = org.apache.spark.sql.catalyst.InternalRow.fromSeq(values.toIndexedSeq)
    new MetadataAggScan(schema, row)
  }

  /** Typed less-than: all values of one column share a type, and long
    * comparison must not round-trip through double (2^53 precision). */
  private def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: Int, y: Int) => x < y
    case (x: Long, y: Long) => x < y
    case (x: Float, y: Float) => x < y
    case (x: Double, y: Double) => x < y
    case _ => false
  }

  override def build(): Scan = pushedAgg match {
    case Some(agg) => metadataAggScan(agg)
    case None =>
      val kept = files.filter(f => exprs.forall(FilePrune.mayMatch(f, _)))
      val pt = ParquetTable(tableName, SparkSession.active, options,
        kept.map(_.path), Some(tableSchema), classOf[ParquetFileFormat])
      val psb = pt.newScanBuilder(options)
      psb.pruneColumns(required)
      // forward through the standard file-source path: sets parquet's
      // data-filter pushdown (footer/row-group skip) internally
      psb.pushFilters(exprs)
      psb.build()
  }
}

/** One-row driver-side scan carrying a metadata-computed aggregate. */
private[sql] final class MetadataAggScan(
    schema: StructType,
    row: org.apache.spark.sql.catalyst.InternalRow)
    extends org.apache.spark.sql.connector.read.LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[org.apache.spark.sql.catalyst.InternalRow] = Array(row)
  override def description(): String = s"GraftMetadataAgg${schema.fieldNames.mkString("[", ",", "]")}"
}

/** Conservative may-match test of a pushed catalyst predicate against
  * one file's log metadata. `true` always safe (file is read, rows
  * re-filtered by the residual); `false` only when partition value or
  * [min,max] bounds PROVE no row can match. Mirrors
  * LakehouseTable.selectFiles semantics. */
private[sql] object FilePrune {
  import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, EqualTo => CEq, Expression, GreaterThan => CGt, GreaterThanOrEqual => CGte, In => CIn, LessThan => CLt, LessThanOrEqual => CLte, Literal, Or => COr}

  /** Literal's internal value as a plain JVM value (UTF8String → String). */
  private def litVal(l: Literal): Any = l.value match {
    case null => null
    case u: org.apache.spark.unsafe.types.UTF8String => u.toString
    case other => other
  }

  def mayMatch(f: DataFileEntry, e: Expression): Boolean = e match {
    case CEq(a: AttributeReference, l: Literal) => eqAllows(f, a.name, litVal(l))
    case CEq(l: Literal, a: AttributeReference) => eqAllows(f, a.name, litVal(l))
    case CIn(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
      vs.exists(v => eqAllows(f, a.name, litVal(v.asInstanceOf[Literal])))
    case CGt(a: AttributeReference, l: Literal) =>
      boundsAllow(f, a.name, lo = Some(litVal(l)), hi = None)
    case CGte(a: AttributeReference, l: Literal) =>
      boundsAllow(f, a.name, lo = Some(litVal(l)), hi = None)
    case CLt(a: AttributeReference, l: Literal) =>
      boundsAllow(f, a.name, lo = None, hi = Some(litVal(l)))
    case CLte(a: AttributeReference, l: Literal) =>
      boundsAllow(f, a.name, lo = None, hi = Some(litVal(l)))
    // mirrored literal-first comparisons flip the bound
    case CGt(l: Literal, a: AttributeReference) =>
      boundsAllow(f, a.name, lo = None, hi = Some(litVal(l)))
    case CGte(l: Literal, a: AttributeReference) =>
      boundsAllow(f, a.name, lo = None, hi = Some(litVal(l)))
    case CLt(l: Literal, a: AttributeReference) =>
      boundsAllow(f, a.name, lo = Some(litVal(l)), hi = None)
    case CLte(l: Literal, a: AttributeReference) =>
      boundsAllow(f, a.name, lo = Some(litVal(l)), hi = None)
    case CAnd(l, r) => mayMatch(f, l) && mayMatch(f, r)
    case COr(l, r) => mayMatch(f, l) || mayMatch(f, r)
    case _ => true // unknown / null-semantics predicates: never prune
  }

  private def eqAllows(f: DataFileEntry, c: String, v: Any): Boolean =
    partitionAllows(f, c, v) && boundsAllow(f, c, Some(v), Some(v))

  /** Identity-partition equality: prune only when the file RECORDS a
    * value for the column and it differs textually from the literal
    * (partition values are written from the same literals, so the
    * textual comparison is exact for the types we partition on). */
  private def partitionAllows(f: DataFileEntry, c: String, v: Any): Boolean =
    f.partitionValues.get(c) match {
      case Some(stored) => v != null && stored == String.valueOf(v)
      case None => true
    }

  /** Column [min,max] bounds vs a requested [lo,hi]. Numeric literals
    * compare as doubles, strings lexicographically — exactly the
    * contract under which the bounds were collected. Missing bounds or
    * unparseable combinations never prune. */
  private def boundsAllow(f: DataFileEntry, c: String,
      lo: Option[Any], hi: Option[Any]): Boolean =
    f.columnStats.flatMap(_.get(c)) match {
      case None => true
      case Some(b) => (lo, hi) match {
        case _ if numeric(lo) || numeric(hi) =>
          (try Some((b.min.toDouble, b.max.toDouble))
          catch { case _: NumberFormatException => None }) match {
            case None => true
            case Some((mn, mx)) =>
              lo.forall(v => asDouble(v).forall(_ <= mx)) &&
                hi.forall(v => asDouble(v).forall(_ >= mn))
          }
        case (Some(_: String), _) | (_, Some(_: String)) =>
          lo.forall(v => v.asInstanceOf[String].compareTo(b.max) <= 0) &&
            hi.forall(v => v.asInstanceOf[String].compareTo(b.min) >= 0)
        case _ => true
      }
    }

  private def numeric(v: Option[Any]): Boolean = v.exists(asDouble(_).isDefined)

  private def asDouble(v: Any): Option[Double] = v match {
    case n: Number => Some(n.doubleValue())
    case _ => None
  }
}

/** Spark DataSource-v2 `TableCatalog` over a graft [[Catalog]] — the
  * native SQL front door the reference gets from DuckDB's
  * `iceberg_scan` (`query_iceberg_duckdb.py:21-29`), expressed the
  * Spark-first way: register the catalog once and every snaplog table
  * is queryable by name with the full ANSI surface, no temp views.
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", classOf[GraftSqlCatalog].getName)
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/path/to/wh")
  * // optionally: spark.sql.catalog.graft.url = jdbc:derby:... (SQL catalog)
  * spark.sql("SELECT ... FROM graft.lake.orders WHERE ...")
  * spark.sql("SELECT ... FROM graft.lake.orders VERSION AS OF 2")      // time travel
  * spark.sql("SELECT ... FROM graft.lake.orders TIMESTAMP AS OF '...'")
  * }}}
  *
  * Each `loadTable` resolves the snapshot's file list from log metadata
  * (no directory listing) and hands Spark its OWN vectorized DSv2
  * parquet table over exactly those files — so predicate pushdown,
  * column pruning, row-group skipping and whole-stage codegen all apply
  * unchanged, and the planner sees an ordinary parquet relation.
  * `VERSION AS OF <snapshot-id>` and `TIMESTAMP AS OF` map onto the
  * snapshot log's time travel.
  *
  * Read-only by design, like the reference's third-party read path:
  * writes go through the transactional `LakehouseTable` API, which is
  * where commit atomicity and optimistic concurrency live. DDL/DML
  * through this catalog fails loudly. Tables with outstanding
  * merge-on-read delete vectors are refused (the plain parquet relation
  * cannot subtract them) — `compact()` first.
  */
class GraftSqlCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var backing: Catalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    val wh = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse must point at a graft warehouse"))
    backing = Option(options.get("url")) match {
      case Some(url) => new JdbcCatalog(url, wh)
      case None => new Snaplog(wh)
    }
  }

  override def name(): String = catName

  // ---- namespaces ---------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] =
    backing.listNamespaces().map(Array(_)).toArray

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else if (backing.namespaceExists(namespace.mkString("."))) Array.empty
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && backing.namespaceExists(namespace(0))

  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] =
    if (namespaceExists(namespace)) Collections.emptyMap()
    else throw new NoSuchNamespaceException(namespace.toSeq)

  override def createNamespace(namespace: Array[String],
      metadata: java.util.Map[String, String]): Unit = {
    require(namespace.length == 1, "graft namespaces are single-level")
    backing.createNamespace(namespace(0))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"$catName is a read-only catalog: alter namespaces via the graft API")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      s"$catName is a read-only catalog: drop namespaces via the graft API")

  // ---- tables -------------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace.toSeq)
    backing.listTables(namespace(0)).map(Identifier.of(namespace, _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace.length == 1 &&
      backing.tableExists(ident.namespace()(0), ident.name)

  override def loadTable(ident: Identifier): Table = load(ident, None)

  /** `VERSION AS OF <id>` — snapshot-id time travel. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val id = try version.toLong catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$catName versions are snapshot ids, got '$version'")
    }
    load(ident, Some(id))
  }

  /** `TIMESTAMP AS OF <t>` — `timestamp` arrives in MICROseconds; the
    * latest snapshot committed at-or-before it is read. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    requireExists(ident)
    val ms = timestamp / 1000L
    val snap = backing.snapshots(ident.namespace()(0), ident.name)
      .filter(_.timestampMs <= ms).lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"no snapshot of ${ident.namespace.mkString(".")}.${ident.name} at or before timestamp $ms ms"))
    load(ident, Some(snap.snapshotId))
  }

  private def requireExists(ident: Identifier): Unit =
    if (!tableExists(ident)) throw new NoSuchTableException(ident)

  private def load(ident: Identifier, asOf: Option[Long]): Table = {
    requireExists(ident)
    val (ns, t) = (ident.namespace()(0), ident.name)
    require(backing.liveDeleteFiles(ns, t, asOf).isEmpty,
      s"$catName.$ns.$t has outstanding merge-on-read delete vectors, which a " +
        "plain parquet relation cannot subtract — compact() the table first")
    val meta = backing.loadTable(ns, t)
    new GraftSqlTable(s"$catName.$ns.$t", meta.schema,
      backing.liveFiles(ns, t, asOf))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"$catName is a read-only catalog: evolve tables via the graft API")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      s"$catName is a read-only catalog: drop tables via the graft API")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"$catName is a read-only catalog: rename tables via the graft API")
}
