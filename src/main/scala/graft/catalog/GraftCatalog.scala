package graft.catalog

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 `TableCatalog` over a directory tree of datasets — the
  * multi-catalog surface a 100 TB deployment addresses tables through
  * (`SELECT ... FROM graft.<dataset>.<table>`) instead of hard-coded
  * paths.
  *
  * Layout contract (matches the driver's testdata tree):
  * `root/<namespace>/<table>.parquet` (file or directory) is a parquet
  * table served by Spark's own DSv2 parquet implementation (full
  * pushdown/pruning/vectorization — the catalog only does name→path
  * resolution); `root/<namespace>/<table>.fimi` (a directory of
  * transaction text) is served by the
  * [[graft.sources.fimi.FimiDataSourceV2]] connector. So one catalog
  * name spans both the columnar star schema and the reference-native
  * mining format.
  *
  * Register with:
  * {{{
  *   spark.sql.catalog.graft      = graft.catalog.GraftCatalog
  *   spark.sql.catalog.graft.root = /root/testdata
  * }}}
  * then `spark.sql("SELECT ... FROM graft.`sf0.001`.lineitem")`.
  *
  * PARQUET datasets are read-only by design (create/alter/drop throw):
  * the engine treats the columnar corpus as immutable snapshots; writes
  * go through the connector write paths and become visible here on the
  * next load. `.fimi` WORK tables, by contrast, are fully managed:
  * `CREATE TABLE ... USING fimi` / atomic CTAS (staged through the
  * manifest log's one-rename commit), row-level DML, `INSERT INTO`,
  * `DROP TABLE`, and the `system.optimize`/`system.vacuum` maintenance
  * procedures. `invalidateTable` drops the resolution cache entry, so
  * an external rewrite is picked up without a session restart.
  *
  * Scale posture: namespace/table listing is one filesystem `listStatus`
  * per level (no recursion); table resolution is cached per identifier;
  * all data-plane work (scan planning, pushdown, splits) happens in the
  * delegated table implementations, which are exactly the ones a plain
  * path-based read would use — the catalog adds zero per-row overhead.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces with FunctionCatalog
    with ProcedureCatalog with StagingTableCatalog {

  private var catalogName: String = _
  private var root: Path = _
  // TrieMap: loadTable can be hit from concurrent query threads
  private val cache = scala.collection.concurrent.TrieMap.empty[Identifier, Table]
  // Property ANNOTATIONS per table (owner, comment, quality tier, ...):
  // `ALTER TABLE ... SET/UNSET TBLPROPERTIES` round-trips through
  // `DESCRIBE EXTENDED`. Deliberately session-scoped (in-memory): the
  // data plane stays immutable (corpus snapshots), and the driver's
  // testdata root is not even writable — a sidecar file would fail
  // there. A production deployment would back this map with its
  // metastore; the catalog API surface is identical either way.
  private val props =
    scala.collection.concurrent.TrieMap.empty[Identifier, Map[String, String]]

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val r = options.get("root")
    require(r != null,
      s"catalog $name needs option spark.sql.catalog.$name.root=<dir>")
    root = new Path(r)
  }

  override def name(): String = catalogName

  // lazy: `root` is fixed at initialize() and a FileSystem handle is
  // cached by scheme inside Hadoop anyway — but newHadoopConf() clones
  // the FULL session conf per call, which a def here would pay on every
  // exists/list during table resolution
  private lazy val fs = root.getFileSystem(
    SparkSession.active.sessionState.newHadoopConf())

  // ------------------------------------------------------ namespaces

  override def listNamespaces(): Array[Array[String]] =
    fs.listStatus(root).filter(_.isDirectory)
      .map(st => Array(st.getPath.getName)).sortBy(_.head)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) listNamespaces()
    else if (namespaceExists(namespace)) Array.empty
    else throw new NoSuchNamespaceException((name() +: namespace).toSeq)
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && {
      val p = new Path(root, namespace.head)
      fs.exists(p) && fs.getFileStatus(p).isDirectory
    }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException((name() +: namespace).toSeq)
    util.Collections.singletonMap("location",
      new Path(root, namespace.head).toString)
  }

  override def createNamespace(
      namespace: Array[String], metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      s"catalog ${name()} is read-only: datasets are corpus snapshots")

  override def alterNamespace(
      namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      s"catalog ${name()} is read-only: datasets are corpus snapshots")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      s"catalog ${name()} is read-only: datasets are corpus snapshots")

  // ----------------------------------------------------------- tables

  private def tablePath(ident: Identifier, ext: String): Path =
    new Path(new Path(root, ident.namespace().mkString("/")), ident.name() + ext)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException((name() +: namespace).toSeq)
    fs.listStatus(new Path(root, namespace.head))
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.endsWith(".parquet")) Some(n.stripSuffix(".parquet"))
        else if (n.endsWith(".fimi") && st.isDirectory) Some(n.stripSuffix(".fimi"))
        else if (n.endsWith(".fimib") && st.isDirectory) Some(n.stripSuffix(".fimib"))
        else None
      }
      .sorted.map(Identifier.of(namespace, _))
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().length == 1 &&
      (fs.exists(tablePath(ident, ".parquet")) || fs.exists(tablePath(ident, ".fimi")) ||
        fs.exists(tablePath(ident, ".fimib")))

  /** Thin delegate that overlays annotation properties on a served
    * table. Read planning forwards to the delegate untouched (same
    * pushdown/pruning/splits); only `properties()` differs. */
  private class AnnotatedTable(d: Table, extra: Map[String, String])
      extends Table with SupportsRead {
    override def name(): String = d.name()
    override def schema(): StructType = d.schema()
    override def columns(): Array[Column] = d.columns()
    override def partitioning(): Array[Transform] = d.partitioning()
    override def capabilities(): util.Set[TableCapability] = d.capabilities()
    override def properties(): util.Map[String, String] = {
      val m = new util.HashMap[String, String](d.properties())
      extra.foreach { case (k, v) => m.put(k, v) }
      m
    }
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : org.apache.spark.sql.connector.read.ScanBuilder =
      d.asInstanceOf[SupportsRead].newScanBuilder(options)
  }

  /** Annotated-fimi flavor: keeps the delegate's write, metadata-column
    * and row-level-DML surfaces visible through the property overlay
    * (Spark discovers each via `isInstanceOf`, so the wrapper must
    * carry the marker interfaces the delegate carries). */
  private class AnnotatedFimiTable(d: graft.sources.fimi.FimiTable, extra: Map[String, String])
      extends AnnotatedTable(d, extra)
      with SupportsWrite
      with SupportsMetadataColumns
      with SupportsRowLevelOperations
      with TruncatableTable {
    override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
        : org.apache.spark.sql.connector.write.WriteBuilder = d.newWriteBuilder(info)
    override def metadataColumns(): Array[MetadataColumn] = d.metadataColumns()
    override def newRowLevelOperationBuilder(
        info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
        : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
      d.newRowLevelOperationBuilder(info)
    override def truncateTable(): Boolean = d.truncateTable()
  }

  private def withAnnotations(ident: Identifier, t: Table): Table =
    props.get(ident).filter(_.nonEmpty)
      .map {
        case p => t match {
          case f: graft.sources.fimi.FimiTable => new AnnotatedFimiTable(f, p): Table
          case _ => new AnnotatedTable(t, p): Table
        }
      }.getOrElse(t)

  override def loadTable(ident: Identifier): Table = {
    // SELECT-able metadata tables (`<cat>.<ns>.<t>.history` / `.files`,
    // the Iceberg convention): a 4-part reference resolves here as
    // Identifier([ns, t], history|files). Served uncached — rows are
    // computed at scan planning anyway, and the ledger must never be
    // staler than the query reading it.
    if (ident.namespace().length == 2 &&
        GraftMetadataTables.Names.contains(ident.name().toLowerCase)) {
      val base = Identifier.of(ident.namespace().take(1), ident.namespace()(1))
      val fimi = tablePath(base, ".fimi")
      if (fs.exists(fimi) && graft.sources.fimi.FimiLog.exists(fs, fimi))
        return GraftMetadataTables.table(ident.name().toLowerCase, fimi, fs)
    }
    loadDataTable(ident)
  }

  private def loadDataTable(ident: Identifier): Table = withAnnotations(ident, {
    val fimib = tablePath(ident, ".fimib")
    if (ident.namespace().length == 1 && fs.exists(fimib)) {
      // bucketed FIMI layout (storage-partitioned join capable): bucket
      // count from the writer's _buckets marker. NOT cached — the count
      // is table STATE, not just a path, and a rewrite with a different
      // N must be visible without invalidateTable (a cached buckets=4
      // table over a rewritten 8-bucket layout would silently list only
      // half the bucket dirs); the per-load cost is one tiny file read.
      val n = graft.sources.fimi.FimiTable.readBucketsMarker(fs, fimib)
        .getOrElse(throw new IllegalStateException(
          s"bucketed fimi table $fimib has no _buckets marker"))
      val opts = new util.HashMap[String, String]()
      opts.put("path", fimib.toString)
      opts.put("buckets", n.toString)
      new graft.sources.fimi.FimiTable(new CaseInsensitiveStringMap(opts))
    } else cache.getOrElseUpdate(ident, {
      val parquet = tablePath(ident, ".parquet")
      val fimi = tablePath(ident, ".fimi")
      if (ident.namespace().length == 1 && fs.exists(parquet))
        org.apache.spark.sql.graft.Bridge.parquetTable(
          SparkSession.active, ident.toString, parquet.toString)
      else if (ident.namespace().length == 1 && fs.exists(fimi)) {
        // strictSchema: catalog-served tables schema-resolve like any
        // lakehouse table — required for row-level DML (see
        // FimiTable.capabilities); path-based writes stay permissive
        val opts = new util.HashMap[String, String]()
        opts.put("path", fimi.toString)
        opts.put("strictSchema", "true")
        new graft.sources.fimi.FimiTable(new CaseInsensitiveStringMap(opts))
      } else throw new NoSuchTableException(ident)
    })
  })

  // ------------------------------------------------------- time travel

  /** SQL `VERSION AS OF <v>` — Spark routes the table reference here.
    * Serves a version-pinned connector table for `.fimi` snapshot
    * tables (the `versionAsOf` option merges into every scan the table
    * plans); an unknown version fails loudly at scan planning
    * (FimiLog.resolve), never as an empty read. Deliberately uncached:
    * the identifier cache holds latest-version tables only. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val fimi = tablePath(ident, ".fimi")
    if (ident.namespace().length == 1 && fs.exists(fimi) &&
        graft.sources.fimi.FimiLog.exists(fs, fimi)) {
      val opts = new util.HashMap[String, String]()
      opts.put("path", fimi.toString)
      opts.put("strictSchema", "true")
      opts.put("versionAsOf", version)
      withAnnotations(ident,
        new graft.sources.fimi.FimiTable(new CaseInsensitiveStringMap(opts)))
    } else if (!tableExists(ident)) throw new NoSuchTableException(ident)
    else throw new UnsupportedOperationException(
      s"table ${name()}.$ident keeps no snapshot log; VERSION AS OF " +
        "applies to fimi snapshot tables (written with " +
        ".option(\"snapshots\", \"true\"))")
  }

  /** SQL `TIMESTAMP AS OF <ts>` — Spark passes MICROSECONDS since
    * epoch. Resolves to the largest version committed at or before the
    * instant via the `#ts` header each commit stamps into its manifest
    * (so a copied/restored log keeps its history; mtime is only the
    * legacy fallback), then serves that pinned version. A timestamp
    * whose true version was vacuumed fails loudly (FimiLog.versionAt),
    * never silently resolving to a later snapshot. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val fimi = tablePath(ident, ".fimi")
    if (ident.namespace().length == 1 && fs.exists(fimi) &&
        graft.sources.fimi.FimiLog.exists(fs, fimi)) {
      val tsMillis = timestamp / 1000L
      val v = graft.sources.fimi.FimiLog.versionAt(fs, fimi, tsMillis)
        .getOrElse(throw new IllegalArgumentException(
          s"${name()}.$ident: no snapshot committed at or before " +
            s"timestamp $tsMillis ms"))
      loadTable(ident, v.toString)
    } else if (!tableExists(ident)) throw new NoSuchTableException(ident)
    else throw new UnsupportedOperationException(
      s"table ${name()}.$ident keeps no snapshot log; TIMESTAMP AS OF " +
        "applies to fimi snapshot tables")
  }

  // --------------------------------------------------------- functions

  /** The one catalog function: the FIMI bucketed-layout transform.
    * Storage-partitioned join planning resolves a scan's reported
    * `bucket(N, tid)` through here and compares the bound function's
    * canonicalName across the join's two sides. */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(namespace, "bucket"))

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.name() == "bucket") graft.sources.fimi.FimiBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  override def invalidateTable(ident: Identifier): Unit = cache.remove(ident)

  // -------------------------------------------------------- procedures

  /** Maintenance procedures under the `system` namespace (the Iceberg
    * convention): `CALL <cat>.system.optimize(...)` /
    * `CALL <cat>.system.vacuum(...)` — see [[GraftProcedures]]. The
    * `system` namespace is virtual (procedures only; no tables), so it
    * does not appear in [[listNamespaces]]. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    if (ident.namespace().sameElements(Array("system")))
      ident.name().toLowerCase match {
        case "optimize" => new GraftProcedures.Optimize(this)
        case "vacuum" => new GraftProcedures.Vacuum(this)
        case "history" => new GraftProcedures.History(this)
        case "detail" => new GraftProcedures.Detail(this)
        case _ => throw new IllegalArgumentException(
          s"catalog ${name()}: no procedure system.${ident.name()} " +
            "(available: system.optimize, system.vacuum, system.history, " +
            "system.detail)")
      }
    else throw new IllegalArgumentException(
      s"catalog ${name()}: procedures live under the `system` namespace " +
        s"(got ${ident.namespace().mkString(".")}.${ident.name()})")
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      Array(Identifier.of(Array("system"), "optimize"),
        Identifier.of(Array("system"), "vacuum"),
        Identifier.of(Array("system"), "history"),
        Identifier.of(Array("system"), "detail"))
    else Array.empty

  /** Path of `<namespace>.<table>` as a fimi table (procedure support;
    * existence is the caller's check). */
  private[catalog] def fimiTablePath(namespace: String, table: String): Path =
    tablePath(Identifier.of(Array(namespace), table), ".fimi")

  /** The catalog root's FileSystem, for procedure implementations. */
  private[catalog] def fsFor(p: Path): org.apache.hadoop.fs.FileSystem = fs

  // ------------------------------------------------ managed fimi tables
  //
  // The catalog stays read-only for the PARQUET corpus snapshots, but
  // `.fimi` work tables are fully managed: CREATE TABLE / CTAS / DROP
  // through SQL, with the manifest log as the atomic commit mechanism.

  /** True when `USING <provider>` names the fimi connector. */
  private def isFimiProvider(properties: util.Map[String, String]): Boolean =
    Option(properties.get(TableCatalog.PROP_PROVIDER))
      .exists(_.equalsIgnoreCase("fimi"))

  private def readOnly(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"catalog ${name()} is read-only for $what: only `USING fimi` work " +
        "tables are managed through SQL (parquet datasets are corpus " +
        "snapshots; write them through the connector paths)")

  /** The writable-table schema contract: `items ARRAY<STRING>` required,
    * `tid BIGINT` tolerated (fimi tids are positional, so a written tid
    * column is carried for shape only), anything else rejected. */
  private def validateFimiSchema(schema: StructType): Unit = {
    val fields = schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    require(fields.get("items").exists {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, _) => true
      case _ => false
    }, s"fimi table schema needs `items ARRAY<STRING>`; got $schema")
    val extra = schema.fieldNames.map(_.toLowerCase).toSet -- Set("tid", "items")
    require(extra.isEmpty,
      s"fimi table schema allows only (tid BIGINT, items ARRAY<STRING>); " +
        s"unexpected columns: ${extra.mkString(", ")}")
  }

  private def stagedOptions(dest: Path, commitOp: String): CaseInsensitiveStringMap = {
    val opts = new util.HashMap[String, String]()
    opts.put("path", dest.toString)
    opts.put("strictSchema", "true")
    opts.put("snapshots", "true")
    // label the staged data commit's manifest with the DDL verb, so
    // `CALL system.history` reports CTAS/RTAS rather than a bare write
    opts.put("commitOp", commitOp)
    new CaseInsensitiveStringMap(opts)
  }

  /** Plain `CREATE TABLE ... USING fimi`: publish an EMPTY snapshot v0
    * so the table is immediately readable, appendable and DML-capable. */
  override def createTable(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (!isFimiProvider(properties)) readOnly(s"CREATE TABLE $ident")
    require(partitions.isEmpty,
      "fimi tables keep no partition transforms (use the bucketed writer " +
        "for the storage-partitioned layout)")
    if (!namespaceExists(ident.namespace()))
      throw new NoSuchNamespaceException((name() +: ident.namespace()).toSeq)
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (name() +: ident.namespace() :+ ident.name()).toSeq)
    validateFimiSchema(schema)
    val dest = tablePath(ident, ".fimi")
    fs.mkdirs(dest)
    graft.sources.fimi.FimiLog.write(fs, dest, 0L, None,
      truncate = true, Seq.empty, op = Some("CREATE TABLE"))
    cache.remove(ident)
    loadTable(ident)
  }

  /** Atomic CTAS (`CREATE TABLE ... USING fimi AS SELECT ...`): the
    * staged table's write commits manifest v0 — data files are invisible
    * until that one rename, so the table appears fully formed or not at
    * all; abort removes the directory. A zero-row CTAS still commits an
    * empty v0 at [[StagedFimiTable.commitStagedChanges]]. */
  override def stageCreate(
      ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable = {
    if (!isFimiProvider(properties)) readOnly(s"CREATE TABLE $ident AS SELECT")
    require(partitions.isEmpty,
      "fimi tables keep no partition transforms")
    if (!namespaceExists(ident.namespace()))
      throw new NoSuchNamespaceException((name() +: ident.namespace()).toSeq)
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (name() +: ident.namespace() :+ ident.name()).toSeq)
    val stagedSchema = StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name(), c.dataType(), c.nullable())))
    validateFimiSchema(stagedSchema)
    val dest = tablePath(ident, ".fimi")
    fs.mkdirs(dest)
    new StagedFimiTable(ident, dest, stagedSchema,
      verb = "CREATE TABLE AS SELECT")
  }

  override def stageCreate(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    stageCreate(ident,
      schema.fields.map(f => Column.create(f.name, f.dataType, f.nullable)),
      partitions, properties)

  /** `REPLACE TABLE ... USING fimi AS SELECT`: the replacement lands as
    * one TRUNCATE manifest at latest+1 — atomic like CTAS, and the
    * pre-replace generations stay time-travel-readable (replace is just
    * another snapshot commit; VACUUM owns retention). Abort leaves the
    * existing table untouched (staged files were never visible). */
  override def stageReplace(
      ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable = {
    if (!isFimiProvider(properties)) readOnly(s"REPLACE TABLE $ident")
    require(partitions.isEmpty, "fimi tables keep no partition transforms")
    val dest = tablePath(ident, ".fimi")
    if (!fs.exists(dest)) throw new NoSuchTableException(ident)
    val stagedSchema = StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name(), c.dataType(), c.nullable())))
    validateFimiSchema(stagedSchema)
    new StagedFimiTable(ident, dest, stagedSchema, createdDir = false,
      verb = "REPLACE TABLE AS SELECT")
  }

  override def stageReplace(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    stageReplace(ident,
      schema.fields.map(f => Column.create(f.name, f.dataType, f.nullable)),
      partitions, properties)

  override def stageCreateOrReplace(
      ident: Identifier, columns: Array[Column],
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable = {
    if (!isFimiProvider(properties))
      readOnly(s"CREATE OR REPLACE TABLE $ident")
    val dest = tablePath(ident, ".fimi")
    if (fs.exists(dest)) stageReplace(ident, columns, partitions, properties)
    else stageCreate(ident, columns, partitions, properties)
  }

  override def stageCreateOrReplace(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): StagedTable =
    stageCreateOrReplace(ident,
      schema.fields.map(f => Column.create(f.name, f.dataType, f.nullable)),
      partitions, properties)

  private class StagedFimiTable(ident: Identifier, dest: Path,
      stagedSchema: StructType, createdDir: Boolean = true,
      verb: String = "CREATE TABLE AS SELECT")
      extends Table with StagedTable with SupportsWrite {
    private val delegate =
      new graft.sources.fimi.FimiTable(stagedOptions(dest, verb))
    override def name(): String = delegate.name()
    // the CTAS/RTAS query's validated shape (items-only is the native
    // write form; a tid column is carried for shape only) — reporting
    // the connector's two-column read schema here would arity-fail an
    // items-only SELECT at analysis
    override def schema(): StructType = stagedSchema
    override def partitioning(): Array[Transform] = delegate.partitioning()
    override def properties(): util.Map[String, String] = delegate.properties()
    override def capabilities(): util.Set[TableCapability] = delegate.capabilities()
    override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
        : org.apache.spark.sql.connector.write.WriteBuilder = delegate.newWriteBuilder(info)
    override def commitStagedChanges(): Unit = {
      // the data write's manifest commit already happened (or the query
      // wrote zero rows — publish an empty v0 so the table exists)
      if (!graft.sources.fimi.FimiLog.exists(fs, dest))
        graft.sources.fimi.FimiLog.write(fs, dest, 0L, None,
          truncate = true, Seq.empty, op = Some(verb))
      cache.remove(ident)
    }
    override def abortStagedChanges(): Unit = {
      // a staged CREATE owns the directory; a staged REPLACE must leave
      // the existing table untouched (its staged files never became
      // visible — the write's own abort clears the staging dir)
      if (createdDir) fs.delete(dest, true)
      cache.remove(ident)
    }
  }

  /** Mutable surfaces: `SET/UNSET TBLPROPERTIES` (session-scoped
    * annotations, see [[props]]) and — on managed `.fimi` SNAPSHOT
    * tables — `ALTER TABLE ... ADD COLUMNS`, the lakehouse
    * schema-evolution verb: an empty manifest commits the new full
    * schema (`#schema` header), data files written from then on carry
    * the added columns as a positional cell suffix per line, and every
    * file written before simply reads NULL for them (null-fill falls
    * out of the prefix encoding — zero bytes rewritten; see the
    * FimiTable scaladoc). Time travel serves each generation under the
    * schema committed at that version. Added columns must be nullable
    * scalars appended at the end: DROP / RENAME / retype / reposition
    * stay rejected, because cells map to columns POSITIONALLY and
    * removing or reordering one would silently re-key every younger
    * file's cells — the migration path for those is `CREATE TABLE ...
    * AS SELECT` (atomic CTAS). Parquet datasets stay fully read-only
    * (corpus snapshots). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val isFimi = fs.exists(tablePath(ident, ".fimi"))
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val unsupported = changes.filterNot(c =>
      c.isInstanceOf[TableChange.SetProperty] ||
        c.isInstanceOf[TableChange.RemoveProperty] ||
        (isFimi && c.isInstanceOf[TableChange.AddColumn]))
    if (unsupported.nonEmpty && isFimi)
      throw new UnsupportedOperationException(
        s"fimi table ${name()}.$ident has a fixed schema contract " +
          "(tid BIGINT positional, items ARRAY<STRING>, plus " +
          "append-only evolved columns); only ALTER TABLE ... ADD " +
          "COLUMNS evolves it — DROP/RENAME/retype would re-key the " +
          "positional cell encoding; migrate with CREATE TABLE ... " +
          s"USING fimi AS SELECT (rejected: ${unsupported.mkString(", ")})")
    if (unsupported.nonEmpty)
      throw new UnsupportedOperationException(
        s"catalog ${name()} is read-only: only table-property annotations " +
          s"may change (rejected: ${unsupported.mkString(", ")})")
    if (adds.nonEmpty && isFimi) addColumns(ident, adds)
    val next = changes.foldLeft(props.getOrElse(ident, Map.empty)) {
      case (m, sp: TableChange.SetProperty) => m + (sp.property -> sp.value)
      case (m, rp: TableChange.RemoveProperty) => m - rp.property
      case (m, _) => m
    }
    if (next.isEmpty) props.remove(ident) else props(ident) = next
    loadTable(ident)
  }

  /** Commit `ALTER TABLE ... ADD COLUMNS` as one empty manifest carrying
    * the evolved full schema. Validation is strict because the file
    * encoding is positional: nullable scalars only (existing rows must
    * null-fill), appended at the end, no duplicates. */
  private def addColumns(
      ident: Identifier, adds: Seq[TableChange.AddColumn]): Unit = {
    import graft.sources.fimi.{FimiLog, FimiTable}
    val dest = tablePath(ident, ".fimi")
    require(FimiLog.exists(fs, dest),
      s"fimi table ${name()}.$ident keeps no snapshot log; ADD COLUMNS " +
        "applies to snapshot tables (the manifest log carries the " +
        "per-generation schema)")
    // the connector's own column namespace is reserved: _file is the
    // metadata column every read can project, and the three change
    // columns ride the feed relation — a user column shadowing any of
    // them would silently misroute on read
    val reserved = Set(graft.sources.fimi.FimiTable.FileColName) ++
      graft.sources.fimi.FimiChanges.ChangeColNames
    // schema and version are (re)computed INSIDE the commit loop: a
    // lost race means a concurrent writer advanced the table — possibly
    // with its own ADD COLUMNS — and committing a schema folded from
    // the stale read would silently drop that writer's columns and
    // positionally re-key every file already carrying their cells
    var committed = false
    while (!committed) {
      val cur = FimiLog.schemaAt(fs, dest, None)
        .map(j => org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[StructType])
        .getOrElse(FimiTable.Schema)
      val next = adds.foldLeft(cur) { (schema, a) =>
        require(a.fieldNames().length == 1,
          s"fimi ADD COLUMNS: nested field ${a.fieldNames().mkString(".")} " +
            "is not supported (top-level scalar columns only)")
        val colName = a.fieldNames()(0)
        require(!reserved.exists(_.equalsIgnoreCase(colName)),
          s"fimi ADD COLUMNS: $colName is a reserved connector column " +
            s"(reserved: ${reserved.mkString(", ")})")
        require(!schema.fieldNames.exists(_.equalsIgnoreCase(colName)),
          s"fimi ADD COLUMNS: column $colName already exists")
        require(a.isNullable,
          s"fimi ADD COLUMNS: $colName must be nullable — rows written " +
            "before the evolution read the column as NULL")
        require(a.position() == null,
          s"fimi ADD COLUMNS: $colName must append at the end (cells map " +
            "to columns positionally; FIRST/AFTER would re-key younger files)")
        require(FimiTable.SupportedExtraTypes.contains(a.dataType()),
          s"fimi ADD COLUMNS: type ${a.dataType().catalogString} is not " +
            "supported (scalars only: string, bigint, int, double, " +
            "boolean, date, timestamp)")
        schema.add(org.apache.spark.sql.types.StructField(
          colName, a.dataType(), nullable = true))
      }
      val v = FimiLog.latestVersion(fs, dest).map(_ + 1).getOrElse(0L)
      committed = FimiLog.write(fs, dest, v, None, truncate = false, Seq.empty,
        op = Some("ADD COLUMNS"), schemaJson = Some(next.json))
    }
    FimiLog.maybeCheckpoint(fs, dest)
    cache.remove(ident)
  }

  /** DROP TABLE: managed `.fimi` work tables only (the CTAS/CREATE
    * surface's cleanup verb — also what Spark's non-atomic fallback
    * relies on); parquet corpus snapshots stay undroppable. */
  override def dropTable(ident: Identifier): Boolean = {
    val fimi = tablePath(ident, ".fimi")
    if (ident.namespace().length == 1 && fs.exists(fimi)) {
      val ok = fs.delete(fimi, true)
      cache.remove(ident)
      props.remove(ident)
      ok
    } else if (!tableExists(ident)) false
    else readOnly(s"DROP TABLE $ident")
  }

  /** `ALTER TABLE ... RENAME TO` — managed `.fimi` work tables only
    * (parquet corpus snapshots stay unrenamable): one directory rename
    * moves data, manifest log and history atomically-enough for a
    * single-writer catalog (the log rides inside the table dir, so the
    * renamed table keeps every snapshot version and its ledger);
    * property annotations follow the identifier. */
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val oldFimi = tablePath(oldIdent, ".fimi")
    if (oldIdent.namespace().length != 1 || !fs.exists(oldFimi)) {
      if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
      readOnly(s"RENAME TABLE $oldIdent")
    }
    require(newIdent.namespace().length == 1,
      s"rename target must be '<namespace>.<table>' (got $newIdent)")
    if (!namespaceExists(newIdent.namespace()))
      throw new NoSuchNamespaceException((name() +: newIdent.namespace()).toSeq)
    if (tableExists(newIdent))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (name() +: newIdent.namespace() :+ newIdent.name()).toSeq)
    val dest = tablePath(newIdent, ".fimi")
    if (!fs.rename(oldFimi, dest))
      throw new java.io.IOException(s"rename $oldFimi -> $dest failed")
    cache.remove(oldIdent)
    cache.remove(newIdent)
    props.remove(oldIdent).foreach(p => props(newIdent) = p)
  }
}
