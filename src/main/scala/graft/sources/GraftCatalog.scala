package graft.sources

import java.io.File

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier,
  ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction,
  ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure,
  ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType,
  StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The ledger connector lifted into Spark's CATALOG plane: a
  * `TableCatalog` whose tables are graft-ledger directories under one
  * root, so the V2-native verbs the session catalog's v1 tables decline
  * — `df.writeTo(t).createOrReplace()`, `.append()`, SQL `DROP TABLE` /
  * name-resolved reads against a custom format — all run through the
  * connector's own write/scan paths (pushdown, file-skipping, stats and
  * streaming included, since `loadTable` returns the same [[LedgerTable]]
  * the path-based API uses).
  *
  * Register per session:
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft_cat", "graft.sources.GraftCatalog")
  *   spark.conf.set("spark.sql.catalog.graft_cat.root", "/data/ledger")
  * }}}
  * Catalog plugins instantiate lazily on first reference and are cached
  * for the session — the root is read once at initialize.
  *
  * Layout: table `ns1.ns2.t` ↔ directory `root/ns1__ns2__t` (flat — the
  * namespace flattens into the directory name; no SupportsNamespaces, so
  * CREATE/DROP NAMESPACE are not offered). `createTable` enforces the
  * ledger's fixed schema (doc_id BIGINT, lang STRING, n_chars BIGINT —
  * name+type, any order of nullability) and rejects partition transforms:
  * the format's layout IS its file-per-task range structure.
  * Replace is non-atomic (drop + create), the documented contract for a
  * non-staging catalog. */
class GraftCatalog extends TableCatalog with ProcedureCatalog
    with FunctionCatalog {
  private var root: File = _
  private var catName: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    val dir = options.get("root")
    require(dir != null,
      s"catalog '$name' requires option 'spark.sql.catalog.$name.root'")
    root = new File(dir)
    root.mkdirs()
    require(root.isDirectory, s"catalog '$name': cannot create root $dir")
  }

  override def name(): String = catName

  /** Opt in to constraint DDL — Spark's planner refuses `ALTER TABLE …
    * ADD/DROP CONSTRAINT` against catalogs that don't declare it. */
  override def capabilities(): java.util.Set[
      org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    java.util.EnumSet.of(org.apache.spark.sql.connector.catalog
      .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT)

  /** "__" is the namespace flattening separator — a SEGMENT containing
    * it would collide two identifiers onto one directory (table `a__b`
    * vs table `b` in namespace `a`). Creation paths REJECT such
    * segments; probe paths (exists/load/drop) treat them as simply not
    * present, so DROP TABLE IF EXISTS stays quiet instead of erroring. */
  private def cleanSegments(ident: Identifier): Boolean =
    (ident.namespace() :+ ident.name()).forall(!_.contains("__"))

  private def tableDir(ident: Identifier): File =
    new File(root, (ident.namespace() :+ ident.name()).mkString("__"))

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val prefix = if (namespace.isEmpty) "" else namespace.mkString("", "__", "__")
    val dirs = Option(root.listFiles()).getOrElse(Array.empty[File])
      .filter(_.isDirectory)
    // the TableCatalog contract: an unknown namespace THROWS rather than
    // listing as empty (`SHOW TABLES IN graft_cat.bogus` must error).
    // A namespace "exists" here exactly when some directory carries its
    // flattened prefix — namespaces have no standalone marker in the
    // flat layout
    if (namespace.nonEmpty && !dirs.exists(_.getName.startsWith(prefix)))
      throw new NoSuchNamespaceException(namespace)
    dirs
      .filter(d => d.getName.startsWith(prefix)
        && !d.getName.stripPrefix(prefix).contains("__"))
      .map(d => Identifier.of(namespace, d.getName.stripPrefix(prefix)))
  }

  override def loadTable(ident: Identifier): Table = {
    val d = tableDir(ident)
    if (!cleanSegments(ident) || !d.isDirectory) {
      // `<table>.history` — the METADATA TABLE spelling every lakehouse
      // catalog offers (Iceberg's t.history, Delta's DESCRIBE HISTORY):
      // the trailing segment addresses a system view OF the table named
      // by the preceding segments. Only offered when no real table
      // shadows the name (a genuine `history` table wins).
      if (ident.name().equalsIgnoreCase("history") &&
          ident.namespace().nonEmpty) {
        val base = Identifier.of(ident.namespace().init,
          ident.namespace().last)
        val bd = tableDir(base)
        if (cleanSegments(base) && bd.isDirectory)
          return new LedgerHistoryTable(bd.getPath, ident.toString)
      }
      // `<table>.refs` — the REF LISTING metadata table (Iceberg's
      // t.refs): one row per tag/branch with its target version and
      // whether that version still reconstructs.
      if (ident.name().equalsIgnoreCase("refs") &&
          ident.namespace().nonEmpty) {
        val base = Identifier.of(ident.namespace().init,
          ident.namespace().last)
        val bd = tableDir(base)
        if (cleanSegments(base) && bd.isDirectory)
          return new LedgerRefsTable(bd.getPath, ident.toString)
      }
      // `<table>.lineage` — the COMMIT GRAPH as a metadata table: one
      // row per version with its `#parent`, the manifest-diff
      // quantities the change-feed planner derives (rows/tombstones
      // the commit added), and whether the commit is on the CURRENT
      // read's lineage — the observability surface for a chain that
      // can interleave branches and carry dead side commits (CAS
      // losers). Same only-when-no-real-table-shadows rule.
      if (ident.name().equalsIgnoreCase("lineage") &&
          ident.namespace().nonEmpty) {
        val base = Identifier.of(ident.namespace().init,
          ident.namespace().last)
        val bd = tableDir(base)
        if (cleanSegments(base) && bd.isDirectory)
          return new LedgerLineageTable(bd.getPath, ident.toString)
      }
      // `<table>.branch_<name>` — the BRANCH pseudo-table (Iceberg's
      // branch_ identifier spelling): a handle that reads the branch
      // head and whose appends advance the branch ref. Same only-when-
      // no-real-table-shadows rule as `.history`.
      if (ident.name().toLowerCase.startsWith("branch_") &&
          ident.namespace().nonEmpty) {
        val bname = ident.name().substring("branch_".length)
        val base = Identifier.of(ident.namespace().init,
          ident.namespace().last)
        val bd = tableDir(base)
        if (cleanSegments(base) && bd.isDirectory &&
            LedgerSource.readRef(bd.getPath, "branch", bname).isDefined)
          return new LedgerTable(bd.getPath,
            bucketWidth = LedgerSource.readBucketWidth(bd.getPath),
            morEnabled = LedgerSource.readMorFlag(bd.getPath),
            ref = Some(bname))
      }
      throw new NoSuchTableException(ident)
    }
    // a table that has branched reads/writes through its main ref
    val mainRef =
      if (LedgerSource.readRef(d.getPath, "branch", "main").isDefined)
        Some("main")
      else None
    new LedgerTable(d.getPath,
      bucketWidth = LedgerSource.readBucketWidth(d.getPath),
      morEnabled = LedgerSource.readMorFlag(d.getPath),
      ref = mainRef)
  }

  /** Time travel (`VERSION AS OF v`): every committed mutation stamps a
    * `_versions/<N>.mf` manifest of the live file set, and ledger file
    * names denote immutable content, so a version either reconstructs
    * exactly from its manifest or fails loudly when later destructive
    * verbs removed its files (the ledger keeps no undo log — the same
    * contract as time-traveling a vacuumed table). The snapshot table
    * is batch-read-only. */
  override def loadTable(ident: Identifier, version: String): Table = {
    val d = tableDir(ident)
    if (!cleanSegments(ident) || !d.isDirectory)
      throw new NoSuchTableException(ident)
    // a commit id, or a NAMED REF: `VERSION AS OF 'stable'` resolves a
    // tag (or a branch head) from `_refs/` — ref names can never be
    // purely numeric, so the spellings cannot collide
    val v = version.toLongOption
      .orElse(LedgerSource.resolveRefVersion(d.getPath, version))
      .getOrElse(throw new IllegalArgumentException(
        s"graft-ledger: '$version' is neither a commit id nor a " +
          s"tag/branch of $ident (refs: " +
          s"${(LedgerSource.listRefs(d.getPath, "tag").keys ++
            LedgerSource.listRefs(d.getPath, "branch").keys)
            .toSeq.sorted.mkString(", ")})"))
    require(LedgerSource.listVersions(d.getPath).contains(v),
      s"no version $v of $ident (available: " +
        s"${LedgerSource.listVersions(d.getPath).mkString(", ")})")
    new LedgerTable(d.getPath, pinnedVersion = Some(v))
  }

  /** `TIMESTAMP AS OF` maps to the newest manifest committed at or
    * before the requested instant (micros since epoch, per the
    * TableCatalog contract). The commit instant is read from the
    * manifest's own `#ts=` header — persisted content, so resolution
    * survives a directory copy / backup-restore / coarse-mtime
    * filesystem; pre-header manifests fall back to their mtime. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    val d = tableDir(ident)
    if (!cleanSegments(ident) || !d.isDirectory)
      throw new NoSuchTableException(ident)
    val candidates = LedgerSource.listVersions(d.getPath).filter { v =>
      LedgerSource.commitTimeMillis(d.getPath, v) * 1000L <= timestampMicros
    }
    require(candidates.nonEmpty,
      s"no version of $ident existed at timestamp $timestampMicros")
    new LedgerTable(d.getPath, pinnedVersion = Some(candidates.max))
  }

  override def tableExists(ident: Identifier): Boolean =
    cleanSegments(ident) && tableDir(ident).isDirectory

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(cleanSegments(ident),
      s"identifier segments may not contain '__' (the namespace " +
        s"separator): $ident")
    require(partitions.isEmpty,
      "graft-ledger tables do not take partition transforms — the format's " +
        "file-per-task range layout is its partitioning")
    val expected = Seq(("doc_id", LongType), ("lang", StringType),
      ("n_chars", LongType))
    val got = schema.fields.map(f => (f.name.toLowerCase, f.dataType)).toSeq
    require(got == expected,
      s"graft-ledger schema is fixed (doc_id BIGINT, lang STRING, n_chars " +
        s"BIGINT); got ${schema.simpleString}")
    val d = tableDir(ident)
    if (d.exists()) throw new TableAlreadyExistsException(ident)
    require(d.mkdirs(), s"cannot create table directory ${d.getPath}")
    // the one layout property: `bucket` = doc_id range-bucket width.
    // Persisted beside the data so writer AND every later reader agree
    // on the same layout contract (the storage-partitioned-join key).
    val width = Option(properties.get("bucket")).map { w =>
      val v = LedgerSource.validBucketWidth(w.toLongOption.getOrElse(
        throw new IllegalArgumentException(
          s"table property 'bucket' must be a positive integer; got '$w'")),
        s"table property 'bucket' of $ident")
      LedgerSource.writeBucketWidth(d.getPath, v)
      v
    }
    // `mor=true` opts the table's row-level verbs into MERGE-ON-READ
    // (tombstone files instead of copy-on-write group rewrites);
    // persisted beside the data so every later loadTable agrees
    val mor = Option(properties.get("mor")).exists { m =>
      val v = m.toBooleanOption.getOrElse(throw new IllegalArgumentException(
        s"table property 'mor' must be true or false; got '$m'"))
      if (v) LedgerSource.writeProp(d.getPath, "mor", "true")
      v
    }
    // `check` = an enforced table-level CHECK constraint (a SQL
    // predicate over the fixed schema) — persisted beside the data so
    // every writer session enforces the same invariant
    Option(properties.get("check")).filter(_.trim.nonEmpty).foreach { c =>
      require(!c.contains("\n"), "the 'check' predicate must be one line")
      LedgerSource.writeProp(d.getPath, "check", c.trim)
    }
    new LedgerTable(d.getPath, bucketWidth = width, morEnabled = mor)
  }

  /** Schema stays fixed (the format IS the schema) — but CONSTRAINT
    * lifecycle is metadata, so `ALTER TABLE … ADD CONSTRAINT c CHECK
    * (…)` / `DROP CONSTRAINT` manage the table's one enforced CHECK
    * slot post-creation. Everything else is still refused. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val d = tableDir(ident)
    if (!cleanSegments(ident) || !d.isDirectory)
      throw new NoSuchTableException(ident)
    changes.foreach {
      case ac: TableChange.AddConstraint => ac.constraint() match {
        case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
          require(LedgerSource.readCheckConstraint(d.getPath).isEmpty,
            s"graft-ledger tables hold ONE CHECK constraint — DROP " +
              s"CONSTRAINT ${LedgerSource.readCheckName(d.getPath)} first")
          require(!c.predicateSql().contains("\n"),
            "the CHECK predicate must be one line")
          LedgerSource.writeProp(d.getPath, "check_name", c.name())
          LedgerSource.writeProp(d.getPath, "check", c.predicateSql().trim)
        case other => throw new UnsupportedOperationException(
          s"graft-ledger supports only CHECK constraints; got ${other.toDDL}")
      }
      case dc: TableChange.DropConstraint =>
        val have = LedgerSource.readCheckConstraint(d.getPath)
          .map(_ => LedgerSource.readCheckName(d.getPath))
        if (have.exists(_.equalsIgnoreCase(dc.name()))) {
          LedgerSource.removeProp(d.getPath, "check")
          LedgerSource.removeProp(d.getPath, "check_name")
        } else if (!dc.ifExists()) throw new IllegalArgumentException(
          s"no constraint named ${dc.name()} on $ident " +
            s"(present: ${have.getOrElse("none")})")
      // `mor` is a WRITE-PATH mode, not a layout fact — toggling it on
      // an existing table is sound in both directions (readers always
      // apply whatever tombstones exist; CoW rewrites after a toggle-off
      // leave old tombstone sections dangling harmlessly, scoped to the
      // file names the rewrite retired). `bucket` stays immutable: it
      // CLAIMS an on-disk layout that flipping a property cannot create.
      case sp: TableChange.SetProperty if sp.property() == "mor" =>
        val v = sp.value().toBooleanOption.getOrElse(
          throw new IllegalArgumentException(
            s"table property 'mor' must be true or false; got '${sp.value()}'"))
        if (v) LedgerSource.writeProp(d.getPath, "mor", "true")
        else LedgerSource.removeProp(d.getPath, "mor")
      case rp: TableChange.RemoveProperty if rp.property() == "mor" =>
        LedgerSource.removeProp(d.getPath, "mor")
      case _ => throw new UnsupportedOperationException(
        "graft-ledger tables have a fixed schema — ALTER TABLE supports " +
          "only constraint changes and the 'mor' property")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val d = tableDir(ident)
    if (!cleanSegments(ident) || !d.isDirectory) false
    else {
      val walk = java.nio.file.Files.walk(d.toPath)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.delete(p); () })
      finally walk.close() // Files.walk holds a directory handle until closed
      true
    }
  }

  // ── catalog functions (`FunctionCatalog`) ──

  /** `<cat>.system.range_bucket(doc_id, width)` — the connector's key
    * semantics exposed as a CATALOG-scoped V2 function: the widest
    * doc_id interval of size `width` containing the key, i.e. the
    * range-layout bucket a row belongs to (what the compaction
    * procedure clusters by). Bound as a [[ScalarFunction]] with the
    * MAGIC invoke method, so Catalyst calls a statically-typed
    * `invoke(long, int): long` (an `Invoke` expression inside
    * whole-stage codegen) rather than boxing an InternalRow per row —
    * the V2-function analogue of writing a native `Expression`. */
  override def loadFunction(ident: Identifier): UnboundFunction = {
    // empty namespace is accepted too: Catalyst's V2ExpressionUtils
    // resolves a scan-reported partition TRANSFORM's function with
    // Identifier.of(Array.empty, name) — the storage-partitioned-join
    // compatibility check depends on that lookup succeeding
    if (!(ident.namespace().isEmpty ||
        ident.namespace().sameElements(Array("system"))))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    ident.name().toLowerCase match {
      case "range_bucket" => RangeBucketFunction
      case "key_span" => KeySpanFunction
      case "bucket" => BucketLayoutFunction
      case _ => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    }
  }

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      Array(Identifier.of(Array("system"), "range_bucket"),
        Identifier.of(Array("system"), "key_span"),
        Identifier.of(Array("system"), "bucket"))
    else Array.empty

  // ── system procedures (`ProcedureCatalog`, Spark 4's CALL verb) ──

  /** `CALL <cat>.system.compact('<table>', <target_files>)` — the
    * lakehouse maintenance verb (Iceberg's `rewrite_data_files`, the
    * s17 compaction idea as an ENGINE procedure): merges a table's
    * small ledger files into `target_files` range-clustered files.
    * The rewrite is a regular DISTRIBUTED Spark job through the
    * connector's own scan and truncate-overwrite write (never a
    * driver-side record loop): read → repartitionByRange on the key →
    * overwrite, so each output file is a contiguous key interval and
    * the stats-header file skip stays maximally selective afterwards.
    * Writing the same directory is safe with this source: input files
    * are listed at plan time, fresh files are UUID-named (no
    * collisions), and the truncate commit drops exactly the files the
    * job didn't write. Returns one summary row (files_before,
    * files_after, n_rows) computed from stats headers — zero record
    * decodes for the report. */
  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    // Spark 4.1 ships no NoSuchProcedureException; procedures are
    // routines, so the analysis-layer ROUTINE_NOT_FOUND exception keeps
    // an unknown CALL target pattern-matchable as an analysis error
    // (the same discipline as the table/function/namespace paths above)
    if (!ident.namespace().sameElements(Array("system")))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    ident.name().toLowerCase match {
      case "compact" => new CompactProcedure(root)
      case "expire_versions" => new ExpireVersionsProcedure(root)
      case "create_tag" => new RefProcedure(root, "create_tag")
      case "drop_tag" => new RefProcedure(root, "drop_tag")
      case "create_branch" => new RefProcedure(root, "create_branch")
      case "drop_branch" => new RefProcedure(root, "drop_branch")
      case "fast_forward" => new RefProcedure(root, "fast_forward")
      case "merge_branch" => new MergeBranchProcedure(root)
      case "rewrite_tombstones" => new RewriteTombstonesProcedure(root)
      case "converge" => new ConvergeProcedure(root)
      case "clone" => new CloneProcedure(root)
      case _ => throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchFunctionException(ident)
    }
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      (Seq("compact", "expire_versions", "create_tag", "drop_tag",
        "create_branch", "drop_branch", "fast_forward", "merge_branch",
        "rewrite_tombstones", "converge", "clone"))
        .map(n => Identifier.of(Array("system"), n)).toArray
    else Array.empty

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    require(cleanSegments(newIdent),
      s"identifier segments may not contain '__' (the namespace " +
        s"separator): $newIdent")
    val from = tableDir(oldIdent)
    if (!cleanSegments(oldIdent) || !from.isDirectory)
      throw new NoSuchTableException(oldIdent)
    val to = tableDir(newIdent)
    if (to.exists()) throw new TableAlreadyExistsException(newIdent)
    require(from.renameTo(to),
      s"rename failed: ${from.getPath} -> ${to.getPath}")
  }
}

/** See [[GraftCatalog.loadProcedure]]. Bound and unbound in one class:
  * the parameter list is fixed, so bind() only validates arity/types by
  * returning itself (Spark coerces arguments to the declared types). */
private[sources] final class CompactProcedure(root: File)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "compact"
  override def description(): String =
    "merge a ledger table's files into target_files range-clustered files"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false // rewrites storage

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name in this catalog (flattened form)").build(),
    ProcedureParameter.in("target_files", IntegerType)
      .comment("number of range-clustered output files").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val table = input.getUTF8String(0).toString
    val target = input.getInt(1)
    require(target > 0, s"target_files must be positive, got $target")
    val dir = new File(root, table)
    if (!dir.isDirectory)
      throw new NoSuchTableException(Identifier.of(Array.empty, table))
    // refuse EARLY on a branched table (the truncate write would refuse
    // anyway, but only after the whole rewrite job ran)
    val branches = LedgerSource.listRefs(dir.getPath, "branch")
    require(branches.isEmpty,
      s"cannot compact $table while branch refs exist " +
        s"(${branches.keys.toSeq.sorted.mkString(", ")}) — " +
        s"CALL system.converge first")
    val before = LedgerSource.ledgerFiles(dir.getPath).length
    // a regular distributed job over the connector's own read/write
    // paths — the procedure is orchestration, not a bespoke engine
    val spark = org.apache.spark.sql.SparkSession.active
    spark.read.format("graft-ledger").load(dir.getPath)
      .repartitionByRange(target, org.apache.spark.sql.functions.col("doc_id"))
      .write.format("graft-ledger").mode("overwrite").save(dir.getPath)
    val stats = LedgerSource.statsSnapshot(dir.getPath)
    val summary = new GenericInternalRow(3)
    summary.setLong(0, before.toLong)
    summary.setLong(1, stats.length.toLong)
    summary.setLong(2, stats.map(_._4).sum)
    java.util.Collections.singletonList(
      new SingleRowScan(CompactProcedure.OutputSchema, summary): Scan).iterator()
  }
}

private[sources] object CompactProcedure {
  val OutputSchema: StructType = StructType(Seq(
    StructField("files_before", LongType, nullable = false),
    StructField("files_after", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))
}

/** `CALL <cat>.system.expire_versions('<table>', <keep>)` — version
  * RETENTION, the verb that completes the time-travel lifecycle
  * (Iceberg's `expire_snapshots` + `remove_orphan_files`): drop every
  * version manifest older than the newest `keep`, then reclaim any
  * data/tombstone file NO SURVIVING manifest references (crash-leftover
  * orphans from aborted task attempts — committed files are always in
  * the latest manifest, so the CURRENT read is untouched by
  * construction, and a file SHARED with a surviving version survives
  * because the reference check is against the union of kept manifests,
  * not the dropped ones). Expired `VERSION AS OF` reads fail loudly
  * afterwards — the s32 "vacuumed table" contract, now produced by an
  * actual verb rather than only by destructive rewrites. Driver-side
  * metadata work only: manifests are tiny listings and the row count
  * in the summary comes from 28-byte stats headers — zero record
  * decodes at any scale. Single-maintainer contract (the connector's
  * documented non-atomic scope): don't run concurrently with an
  * in-flight write whose files have landed but not yet committed. */
private[sources] final class ExpireVersionsProcedure(root: File)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "expire_versions"
  override def description(): String =
    "drop version manifests older than the newest `keep` and reclaim " +
      "files no surviving manifest references"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false // rewrites storage

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name in this catalog (flattened form)").build(),
    ProcedureParameter.in("keep", IntegerType)
      .comment("number of newest versions to retain (>= 1)").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val table = input.getUTF8String(0).toString
    val keep = input.getInt(1)
    require(keep >= 1, s"keep must be >= 1 (the current version is " +
      s"always retained), got $keep")
    val dir = new File(root, table)
    if (!dir.isDirectory)
      throw new NoSuchTableException(Identifier.of(Array.empty, table))
    // a branch ref's target version must never expire out from under
    // it — refuse on branched tables (tags keep the dangle-loudly
    // contract: a tag is a name, not a lineage)
    val branches = LedgerSource.listRefs(dir.getPath, "branch")
    require(branches.isEmpty,
      s"cannot expire versions of $table while branch refs exist " +
        s"(${branches.keys.toSeq.sorted.mkString(", ")}) — " +
        s"CALL system.converge first")
    val versions = LedgerSource.listVersions(dir.getPath)
    val (expired, kept) =
      versions.splitAt(math.max(0, versions.length - keep))
    val referenced: Set[String] =
      kept.flatMap(v => LedgerSource.readManifest(dir.getPath, v)).toSet
    // drop manifests FIRST: if reclamation dies midway, a dangling
    // version can only fail loudly (the s32 contract), never resolve
    // to a partially-reclaimed file set
    val vdir = new File(dir, LedgerSource.VersionsDir)
    expired.foreach { v =>
      val mf = new File(vdir, s"$v.mf")
      require(mf.delete(), s"cannot remove manifest ${mf.getPath}")
    }
    // a table with NO manifests (never committed through this source)
    // has nothing to anchor the reference check — reclaim nothing
    val orphans =
      if (kept.isEmpty) Array.empty[File]
      else (LedgerSource.ledgerFiles(dir.getPath) ++
        LedgerSource.deleteFiles(dir.getPath))
        .filterNot(f => referenced.contains(f.getName))
    orphans.foreach(f =>
      require(f.delete(), s"cannot reclaim orphan ${f.getPath}"))
    val summary = new GenericInternalRow(3)
    summary.setLong(0, expired.length.toLong)
    summary.setLong(1, orphans.length.toLong)
    summary.setLong(2, LedgerSource.statsSnapshot(dir.getPath).map(_._4).sum)
    java.util.Collections.singletonList(
      new SingleRowScan(ExpireVersionsProcedure.OutputSchema,
        summary): Scan).iterator()
  }
}

private[sources] object ExpireVersionsProcedure {
  val OutputSchema: StructType = StructType(Seq(
    StructField("versions_expired", LongType, nullable = false),
    StructField("files_reclaimed", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false)))
}

/** The REF verbs (round 15 — Iceberg's tag/branch procedures on the
  * ledger's `_refs/` store): one class, verb-dispatched, because every
  * verb is a tiny metadata move over the same (table, name[, version])
  * shape —
  *
  *   - `create_tag(t, name, version)`: an immutable NAME for a commit;
  *     `VERSION AS OF 'name'` resolves it;
  *   - `create_branch(t, name)`: a writable fork at the CURRENT main
  *     head — metadata-only, zero bytes copied; also pins the implicit
  *     `main` ref the first time (from then on unpinned reads resolve
  *     through main, since the directory now holds multiple lineages);
  *   - `fast_forward(t, name)`: advance main to the branch head,
  *     allowed only when main's manifest is a SUBSET of the branch's
  *     (the git FF condition — append-only lineage makes file-set
  *     containment exactly ancestry); diverged lineages refuse;
  *   - `drop_tag` / `drop_branch`: remove the ref (a dropped branch's
  *     files stay until `converge`/`expire_versions` reclaims them).
  *
  * Each returns one row `(ref, version)`. */
private[sources] final class RefProcedure(root: File, verb: String)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = verb
  override def description(): String = verb match {
    case "create_tag" => "name a commit: VERSION AS OF '<name>' resolves it"
    case "drop_tag" => "remove a tag ref"
    case "create_branch" =>
      "fork a writable branch at the current main head (metadata-only)"
    case "drop_branch" => "remove a branch ref (files stay until converge)"
    case "fast_forward" =>
      "advance main to a branch head when main is its ancestor"
    case _ => verb
  }
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false // moves refs

  override def parameters(): Array[ProcedureParameter] = {
    val base = Array(
      ProcedureParameter.in("table", StringType)
        .comment("table name in this catalog (flattened form)").build(),
      ProcedureParameter.in("name", StringType)
        .comment("ref name ([A-Za-z_][A-Za-z0-9_-]*)").build())
    if (verb == "create_tag")
      base :+ ProcedureParameter.in("version", LongType)
        .comment("commit id the tag names").build()
    else base
  }

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val table = input.getUTF8String(0).toString
    val name = LedgerSource.validRefName(input.getUTF8String(1).toString)
    val dir = new File(root, table)
    if (!dir.isDirectory)
      throw new NoSuchTableException(Identifier.of(Array.empty, table))
    val d = dir.getPath
    def refuseCollision(): Unit = require(
      LedgerSource.resolveRefVersion(d, name).isEmpty,
      s"a tag or branch named '$name' already exists on $table — " +
        s"names share one resolution namespace")
    val version: Long = verb match {
      case "create_tag" =>
        refuseCollision()
        // LongType (not Int): commit ids are Long everywhere else on
        // this surface — versions, refs, history — and a long-lived
        // table's ids pass Int.MaxValue
        val v = input.getLong(2)
        require(LedgerSource.listVersions(d).contains(v),
          s"no version $v of $table (available: " +
            s"${LedgerSource.listVersions(d).mkString(", ")})")
        LedgerSource.writeRef(d, "tag", name, v)
        v
      case "drop_tag" =>
        val v = LedgerSource.readRef(d, "tag", name).getOrElse(
          throw new IllegalArgumentException(s"no tag '$name' on $table"))
        LedgerSource.dropRef(d, "tag", name)
        v
      case "create_branch" =>
        require(name != "main", "'main' is the implicit trunk ref")
        refuseCollision()
        val head = LedgerSource.readRef(d, "branch", "main").getOrElse {
          val vs = LedgerSource.listVersions(d)
          require(vs.nonEmpty,
            s"$table has no committed versions to branch from")
          vs.max
        }
        // pin the trunk FIRST: from here on the live listing stops
        // being the table's state, so main must resolve by ref
        if (LedgerSource.readRef(d, "branch", "main").isEmpty)
          LedgerSource.writeRef(d, "branch", "main", head)
        LedgerSource.writeRef(d, "branch", name, head)
        head
      case "drop_branch" =>
        require(name != "main",
          "cannot drop 'main' — CALL system.converge to un-branch a table")
        val v = LedgerSource.readRef(d, "branch", name).getOrElse(
          throw new IllegalArgumentException(s"no branch '$name' on $table"))
        LedgerSource.dropRef(d, "branch", name)
        v
      case "fast_forward" =>
        val mainV = LedgerSource.readRef(d, "branch", "main").getOrElse(
          throw new IllegalStateException(s"$table has no main ref — " +
            s"nothing to fast-forward"))
        val devV = LedgerSource.readRef(d, "branch", name).getOrElse(
          throw new IllegalArgumentException(s"no branch '$name' on $table"))
        val mainSet = LedgerSource.readManifest(d, mainV).toSet
        val devSet = LedgerSource.readManifest(d, devV).toSet
        require(mainSet.subsetOf(devSet),
          s"main (v$mainV) is not an ancestor of '$name' (v$devV) — " +
            s"the lineages diverged (${(mainSet -- devSet).size} file(s) " +
            s"only on main); use merge_branch, or replay the branch")
        // CAS from the validated head: a concurrent main writer means
        // the ancestry check above was against a stale head — refuse
        // loudly rather than advance over the racer's commit
        require(LedgerSource.casAdvanceRef(d, "branch", "main", mainV, devV),
          s"main of $table moved concurrently (validated v$mainV) — " +
            s"re-validate and retry the fast_forward")
        devV
      case other => throw new IllegalStateException(s"unknown verb $other")
    }
    val out = new GenericInternalRow(2)
    out.update(0, UTF8String.fromString(name))
    out.setLong(1, version)
    java.util.Collections.singletonList(
      new SingleRowScan(RefProcedure.OutputSchema, out): Scan).iterator()
  }
}

private[sources] object RefProcedure {
  val OutputSchema: StructType = StructType(Seq(
    StructField("ref", StringType, nullable = false),
    StructField("version", LongType, nullable = false)))
}

/** `CALL <cat>.system.rewrite_tombstones('<table>', <frac>)` — TARGETED
  * tombstone maintenance (Iceberg's `rewrite_position_delete_files`):
  * the read-amplification half of the MoR cost model s41 quantified for
  * writes. `system.compact` applies-and-drops the WHOLE overlay by
  * truncate-rewriting the table; this verb folds the overlay only for
  * data files whose tombstone/row ratio EXCEEDS `frac` — each hot
  * file's survivors land under a fresh name (zero survivors → the file
  * unlinks outright), its sections drop from the `.gd` files (a mixed
  * delete file rewrites with only its cold sections; an all-hot one
  * unlinks), and COLD files keep their bytes, their names, and their
  * live overlay untouched. Everything is header/section arithmetic +
  * O(hot bytes) streaming rewrites — a 100 TB table pays for its hot
  * 1%, not the corpus. DESTRUCTIVE by the format's contract: refused
  * while branch refs exist, and a change-feed interval crossing the
  * rewrite refuses loudly (before-images of folded rows are gone — the
  * same vacuumed-table honesty as compaction, pinned in
  * `LedgerMorSpec`). Returns `(files_rewritten, tombstones_dropped,
  * version)`. */
private[sources] final class RewriteTombstonesProcedure(root: File)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "rewrite_tombstones"
  override def description(): String =
    "fold the merge-on-read overlay for data files whose tombstone " +
      "fraction exceeds frac; cold files keep their overlay"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false // rewrites storage

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name in this catalog (flattened form)").build(),
    ProcedureParameter.in("frac", DoubleType)
      .comment("rewrite a data file when tombstones/rows > frac").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val table = input.getUTF8String(0).toString
    val frac = input.getDouble(1)
    require(frac >= 0.0 && frac <= 1.0,
      s"frac must be in [0, 1], got $frac")
    val dir = new File(root, table)
    if (!dir.isDirectory)
      throw new NoSuchTableException(Identifier.of(Array.empty, table))
    val d = dir.getPath
    val branches = LedgerSource.listRefs(d, "branch")
    require(branches.isEmpty,
      s"cannot rewrite tombstones of $table while branch refs exist " +
        s"(${branches.keys.toSeq.sorted.mkString(", ")}) — other " +
        s"lineages' manifests reference the files this verb unlinks")
    val overlay = LedgerSource.deleteOverlay(d)
    // HOT files: tombstoned fraction above the threshold. Ratio math is
    // header rows + section key counts — no record decodes
    val hot = LedgerSource.statsSnapshot(d).filter {
      case (f, _, _, rows) => rows > 0 &&
        overlay.get(f.getName).exists(t =>
          t.distinct.length.toDouble / rows > frac)
    }
    // fold each hot file: stream survivors (minus ITS tombstones) to a
    // fresh name — the empty interval makes rewriteExcluding a pure
    // overlay fold
    val emptyBounds = KeyBounds(Long.MaxValue, Long.MinValue)
    hot.foreach { case (f, _, _, _) =>
      LedgerSource.rewriteExcluding(f, emptyBounds, overlay(f.getName))
    }
    val dead = hot.map(_._1.getName).toSet
    // drop the folded files' sections from the overlay; cold sections
    // (and all-cold delete files) stay byte-identical
    var dropped = 0L
    LedgerSource.deleteFiles(d).foreach { df =>
      val sections = LedgerSource.readDeleteSections(df)
      if (sections.exists(s => dead.contains(s._1))) {
        dropped += sections.filter(s => dead.contains(s._1))
          .map(_._2.distinct.length.toLong).sum
        val keep = sections.filterNot(s => dead.contains(s._1))
        if (keep.nonEmpty)
          LedgerSource.writeDeleteFile(d, keep.toMap): Unit
        require(df.delete(),
          s"graft-ledger: cannot remove delete file ${df.getPath}")
      }
    }
    val v = LedgerSource.commitVersion(d)
    val out = new GenericInternalRow(3)
    out.setLong(0, dead.size.toLong)
    out.setLong(1, dropped)
    out.setLong(2, v)
    java.util.Collections.singletonList(
      new SingleRowScan(RewriteTombstonesProcedure.OutputSchema, out): Scan)
      .iterator()
  }
}

private[sources] object RewriteTombstonesProcedure {
  val OutputSchema: StructType = StructType(Seq(
    StructField("files_rewritten", LongType, nullable = false),
    StructField("tombstones_dropped", LongType, nullable = false),
    StructField("version", LongType, nullable = false)))
}

/** `CALL <cat>.system.merge_branch('<table>', '<from>', '<into>')` —
  * TRUE MERGE of diverged lineages, the ref verb `fast_forward` cannot
  * express (FF refuses when both sides committed). Append-only + MoR
  * divergence makes the merge a FILE-SET UNION:
  *
  *   - the fork point is the `#parent`-chain merge-base (git's
  *     merge-base, computed the same way);
  *   - the merged manifest is `manifest(into) ∪ manifest(from)` — both
  *     sides' post-fork appends land, shared pre-fork files counted
  *     once; MoR tombstone files union alongside, so a delete cut on
  *     either side against a shared pre-fork file applies to the
  *     merged read (duplicate keys collapse in the reader's sorted
  *     overlay);
  *   - the commit's lineage parent is `into`'s head and its diff is
  *     adds-only (the from-side files), so the change feed replays the
  *     merge as the inserts it is — feed-total across the merge;
  *   - REFUSED when either side lost fork-point files (a rewrite /
  *     compaction / expiry destroyed shared state — unreachable through
  *     the public verbs, which are branch-refused, so this arm is the
  *     corruption guard) or when the sides share a post-fork file name
  *     (double-count; impossible under fresh-UUID writes, same guard).
  *
  * Key-level conflicts (both sides re-inserting one key) are the
  * writer's contract, exactly as in Iceberg: the merge is file-level.
  * Returns one row `(ref, version, files_merged)`. */
private[sources] final class MergeBranchProcedure(root: File)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "merge_branch"
  override def description(): String =
    "merge a diverged branch into another lineage by file-set union"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false // moves refs, commits

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name in this catalog (flattened form)").build(),
    ProcedureParameter.in("from", StringType)
      .comment("branch whose lineage merges in").build(),
    ProcedureParameter.in("into", StringType)
      .comment("branch that receives the merge ('main' included)").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val table = input.getUTF8String(0).toString
    val from = LedgerSource.validRefName(input.getUTF8String(1).toString)
    val into = LedgerSource.validRefName(input.getUTF8String(2).toString)
    val dir = new File(root, table)
    if (!dir.isDirectory)
      throw new NoSuchTableException(Identifier.of(Array.empty, table))
    val d = dir.getPath
    require(from != into, s"cannot merge '$from' into itself")
    def head(r: String): Long = LedgerSource.readRef(d, "branch", r)
      .getOrElse(throw new IllegalArgumentException(
        s"no branch '$r' on $table"))
    val fromV = head(from)
    val intoV = head(into)
    val fork = LedgerSource.commonAncestor(d, fromV, intoV)
    val forkSet: Set[String] =
      if (fork == 0) Set.empty
      else LedgerSource.readManifest(d, fork).toSet
    val fromSet = LedgerSource.readManifest(d, fromV).toSet
    val intoSet = LedgerSource.readManifest(d, intoV).toSet
    // the corruption guard: append-only + MoR lineages only GROW their
    // manifests, so a missing fork-point file means shared state was
    // destroyed and the union would resurrect a half-table
    val lostFrom = forkSet -- fromSet
    val lostInto = forkSet -- intoSet
    require(lostFrom.isEmpty && lostInto.isEmpty,
      s"cannot merge '$from' into '$into' on $table — fork-point files " +
        s"were removed (${(lostFrom ++ lostInto).take(3).mkString(", ")}…): " +
        s"a rewrite/compaction/expiry destroyed shared state")
    val shared = (fromSet -- forkSet).intersect(intoSet -- forkSet)
    require(shared.isEmpty,
      s"cannot merge '$from' into '$into' on $table — post-fork file " +
        s"names shared by both lineages (${shared.take(3).mkString(", ")}): " +
        s"the union would double-count their rows")
    val mine = (fromSet -- intoSet).toSeq.sorted
    // adds-only commit on INTO's lineage: manifest = into ∪ from,
    // parent = into's head — the feed replays the merge as inserts.
    // CAS from the validated head: a racing into-writer invalidates
    // the fork-point analysis above, so refuse rather than clobber
    val v = LedgerSource.commitVersion(d, added = Some(mine),
      base = Some(intoV))
    require(LedgerSource.casAdvanceRef(d, "branch", into, intoV, v),
      s"'$into' of $table moved concurrently (validated v$intoV) — " +
        s"re-validate and retry the merge")
    val out = new GenericInternalRow(3)
    out.update(0, UTF8String.fromString(into))
    out.setLong(1, v)
    out.setLong(2, mine.length.toLong)
    java.util.Collections.singletonList(
      new SingleRowScan(MergeBranchProcedure.OutputSchema, out): Scan)
      .iterator()
  }
}

private[sources] object MergeBranchProcedure {
  val OutputSchema: StructType = StructType(Seq(
    StructField("ref", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("files_merged", LongType, nullable = false)))
}

/** `CALL <cat>.system.converge('<table>')` — un-branch: reconcile an
  * ever-branched table back to a single lineage. Requires every forked
  * branch dropped or fast-forwarded; then the main manifest IS the
  * state, so every live file outside it (dropped branches' leftovers)
  * is reclaimed, all refs are removed, and a fresh listing version
  * anchors the chain. Destructive verbs (truncate, purge, copy-on-write
  * rewrites, compaction, expiry) are refused while branch refs exist
  * and re-enable after converge. Branch-era versions and tags whose
  * files were reclaimed dangle LOUDLY afterwards — the same vacuumed-
  * table contract as expire_versions. */
private[sources] final class ConvergeProcedure(root: File)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "converge"
  override def description(): String =
    "reconcile a branched table to its main lineage and drop all refs"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false // rewrites storage

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("table", StringType)
      .comment("table name in this catalog (flattened form)").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val table = input.getUTF8String(0).toString
    val dir = new File(root, table)
    if (!dir.isDirectory)
      throw new NoSuchTableException(Identifier.of(Array.empty, table))
    val d = dir.getPath
    val forked = LedgerSource.forkedBranches(d)
    require(forked.isEmpty,
      s"branches still exist on $table (${forked.mkString(", ")}) — " +
        s"drop or fast-forward them first")
    val mainV = LedgerSource.readRef(d, "branch", "main").getOrElse(
      throw new IllegalStateException(
        s"$table has no main ref — it never branched; nothing to converge"))
    // resolve BEFORE deleting anything: fails loudly if main is broken
    val keep = LedgerSource.resolvePinned(d, mainV).map(_.getName).toSet
    val orphans = (LedgerSource.ledgerFiles(d) ++ LedgerSource.deleteFiles(d))
      .filterNot(f => keep.contains(f.getName))
    orphans.foreach(f =>
      require(f.delete(), s"cannot reclaim orphan ${f.getPath}"))
    LedgerSource.dropRef(d, "branch", "main")
    // tags survive converge (they are names, not lineages) — they
    // dangle loudly if the reclaim took their files.
    // base = main's head: the converge commit's lineage parent must be
    // the lineage it preserved — without it the #parent header would be
    // the numeric chain head, possibly a DROPPED branch's last commit,
    // and a post-converge change feed would walk the dropped lineage
    // (refusing on its appends, or worse silently replaying its
    // MoR-delete events as main's). The diff against main is empty, so
    // CDF continuity across converge is exact.
    val v = LedgerSource.commitVersion(d, base = Some(mainV))
    val out = new GenericInternalRow(2)
    out.setLong(0, orphans.length.toLong)
    out.setLong(1, v)
    java.util.Collections.singletonList(
      new SingleRowScan(ConvergeProcedure.OutputSchema, out): Scan).iterator()
  }
}

private[sources] object ConvergeProcedure {
  val OutputSchema: StructType = StructType(Seq(
    StructField("files_reclaimed", LongType, nullable = false),
    StructField("version", LongType, nullable = false)))
}

/** `CALL <cat>.system.clone('<src>', '<dst>')` — ZERO-COPY table clone
  * (Delta's `CREATE TABLE … CLONE`): a new independent table whose
  * initial state is the source's CURRENT state, copying no data bytes.
  * Ledger file names denote immutable content, so the clone HARD-LINKS
  * every live data/tombstone file into the new directory — each table
  * then owns its own link: a destructive verb on either side unlinks
  * only its own directory entry while the other keeps the bytes (the
  * filesystem's refcount plays the role a shared object store plays
  * for Delta clones; `LedgerCloneSpec` pins nlink = 2 as the
  * zero-copy proof and compacts the SOURCE to prove the clone's reads
  * survive). The clone starts a FRESH version chain at v1 (source
  * history/refs are names into the source's chain and are not
  * copied), carries `_props` (bucket layout, mor mode, check
  * constraint), and a branched source clones its MAIN lineage —
  * resolved through the ref, never the mixed live listing. */
private[sources] final class CloneProcedure(root: File)
    extends UnboundProcedure with BoundProcedure {
  override def name(): String = "clone"
  override def description(): String =
    "zero-copy clone: hard-link the source's current state into a new " +
      "independent table with a fresh version chain"
  override def bind(inputType: StructType): BoundProcedure = this
  override def isDeterministic: Boolean = false // creates storage

  override def parameters(): Array[ProcedureParameter] = Array(
    ProcedureParameter.in("source", StringType)
      .comment("existing table name in this catalog (flattened form)").build(),
    ProcedureParameter.in("target", StringType)
      .comment("new table name; must not exist").build())

  override def call(input: InternalRow): java.util.Iterator[Scan] = {
    val src = input.getUTF8String(0).toString
    val dst = input.getUTF8String(1).toString
    val sdir = new File(root, src)
    if (!sdir.isDirectory)
      throw new NoSuchTableException(Identifier.of(Array.empty, src))
    val ddir = new File(root, dst)
    if (ddir.exists())
      throw new TableAlreadyExistsException(
        Identifier.of(Array.empty, dst))
    require(!dst.contains("__") && !dst.contains("/") && dst.nonEmpty,
      s"invalid target table name '$dst'")
    // the source's CURRENT state: the main lineage when branched
    // (never the mixed live listing), the live listing otherwise
    val files: Seq[File] =
      LedgerSource.readRef(sdir.getPath, "branch", "main") match {
        case Some(v) => LedgerSource.resolvePinned(sdir.getPath, v).toSeq
        case None => (LedgerSource.ledgerFiles(sdir.getPath) ++
          LedgerSource.deleteFiles(sdir.getPath)).toSeq
      }
    require(ddir.mkdirs(), s"cannot create ${ddir.getPath}")
    files.foreach { f =>
      java.nio.file.Files.createLink(
        new File(ddir, f.getName).toPath, f.toPath)
    }
    val props = new File(sdir, "_props")
    if (props.isFile)
      java.nio.file.Files.copy(props.toPath,
        new File(ddir, "_props").toPath)
    // fresh chain: the clone's v1 is exactly the linked state
    val v = LedgerSource.commitVersion(ddir.getPath)
    // n_rows COUNTS THROUGH the MoR overlay the clone carried: header
    // rows alone would overstate live rows on a tombstoned source (the
    // linked `.gd` files suppress rows of the linked `.gl` files).
    // Driver-side header+section reads only — no record decodes.
    val overlay = LedgerSource.deleteOverlay(ddir.getPath)
    val liveRows = LedgerSource.statsSnapshot(ddir.getPath).map {
      case (f, _, _, rows) =>
        rows - overlay.get(f.getName).map(_.distinct.length.toLong)
          .getOrElse(0L)
    }.sum
    val summary = new GenericInternalRow(3)
    summary.setLong(0, files.length.toLong)
    summary.setLong(1, liveRows)
    summary.setLong(2, v)
    java.util.Collections.singletonList(
      new SingleRowScan(CloneProcedure.OutputSchema, summary): Scan)
      .iterator()
  }
}

private[sources] object CloneProcedure {
  val OutputSchema: StructType = StructType(Seq(
    StructField("files_linked", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("version", LongType, nullable = false)))
}

/** See [[GraftCatalog.loadFunction]]. The unbound form validates arity
  * and binds to the typed scalar; `invoke` is the magic method Catalyst
  * resolves reflectively and calls via a codegen-friendly `Invoke`. */
private[sources] object RangeBucketFunction extends UnboundFunction {
  override def name(): String = "range_bucket"
  override def description(): String =
    "range_bucket(doc_id BIGINT, width INT) -> BIGINT: start of the " +
      "width-sized doc_id interval containing the key"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"range_bucket takes (doc_id BIGINT, width INT); got ${inputType.simpleString}")
    RangeBucketBound
  }
}

private[sources] object RangeBucketBound extends ScalarFunction[java.lang.Long] {
  override def name(): String = "range_bucket"
  override def canonicalName(): String = "graft.range_bucket"
  override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
    Array(LongType, IntegerType)
  override def resultType(): org.apache.spark.sql.types.DataType = LongType
  override def isResultNullable: Boolean = false

  /** Magic method — Catalyst invokes this statically-typed overload
    * per row (no InternalRow boxing). floorDiv keeps negative keys in
    * their natural bucket ([-width, -1] -> -width, not 0). */
  def invoke(docId: Long, width: Int): Long = {
    require(width > 0, s"range_bucket width must be positive, got $width")
    Math.floorDiv(docId, width.toLong) * width
  }

  /** Row-based fallback (used if magic-method resolution is disabled). */
  override def produceResult(input: InternalRow): java.lang.Long =
    java.lang.Long.valueOf(invoke(input.getLong(0), input.getInt(1)))
}

/** `<cat>.system.key_span(doc_id)` — a catalog-scoped V2 AGGREGATE
  * function: the width of the key interval a group covers
  * (max − min + 1), the quantity the connector's range layout and
  * stats-header skip selectivity are built around. Spark wraps the
  * (state, update, merge, produce) quartet in a partial-aggregable
  * imperative aggregate, so map-side combine applies exactly as for a
  * built-in — `merge` IS the shuffle contract. State is a 2-slot
  * primitive array (min, max): serializable, allocation-light. */
private[sources] object KeySpanFunction extends UnboundFunction {
  override def name(): String = "key_span"
  override def description(): String =
    "key_span(doc_id BIGINT) -> BIGINT: max(doc_id) - min(doc_id) + 1 " +
      "over the group; null for all-null groups"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 1,
      s"key_span takes one BIGINT column; got ${inputType.simpleString}")
    KeySpanBound
  }
}

private[sources] object KeySpanBound
    extends org.apache.spark.sql.connector.catalog.functions
      .AggregateFunction[Array[Long], java.lang.Long] {
  override def name(): String = "key_span"
  override def canonicalName(): String = "graft.key_span"
  override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
    Array(LongType)
  override def resultType(): org.apache.spark.sql.types.DataType = LongType
  override def isResultNullable: Boolean = true // all-null group

  override def newAggregationState(): Array[Long] =
    Array(Long.MaxValue, Long.MinValue) // empty interval: min > max
  override def update(state: Array[Long], input: InternalRow): Array[Long] = {
    if (!input.isNullAt(0)) {
      val v = input.getLong(0)
      state(0) = math.min(state(0), v)
      state(1) = math.max(state(1), v)
    }
    state
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    a(0) = math.min(a(0), b(0))
    a(1) = math.max(a(1), b(1))
    a
  }
  override def produceResult(state: Array[Long]): java.lang.Long =
    if (state(0) > state(1)) null
    else java.lang.Long.valueOf(state(1) - state(0) + 1)
}

/** `bucket(width, doc_id)` — the LAYOUT transform behind the
  * storage-partitioned join: `LedgerScan.outputPartitioning` reports a
  * `BucketTransform` over the key (the one shape Catalyst's
  * `KeyGroupedPartitioning.supportsExpressions` admits — the numeric
  * argument rides out-of-band, not as a child), and Catalyst resolves
  * it HERE to check two sides' partitionings for compatibility.
  * Semantics are the RANGE bucket start (`floorDiv(doc_id, width) *
  * width`), not a hash bucket — opaque to Spark, which only needs
  * equal join keys to land in equal partition values; the width is
  * part of the bound identity, so only same-width layouts co-join. */
private[sources] object BucketLayoutFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(width INT, doc_id BIGINT) -> BIGINT: range-bucket start " +
      "of the width-sized doc_id interval (the ledger layout transform)"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.length == 2,
      s"bucket takes (width INT, doc_id BIGINT); got ${inputType.simpleString}")
    BucketLayoutBound
  }
}

private[sources] object BucketLayoutBound extends ScalarFunction[java.lang.Long] {
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket"
  override def inputTypes(): Array[org.apache.spark.sql.types.DataType] =
    Array(IntegerType, LongType)
  override def resultType(): org.apache.spark.sql.types.DataType = LongType
  override def isResultNullable: Boolean = false

  /** Magic method — statically-typed per-row call. */
  def invoke(width: Int, docId: Long): Long =
    Math.floorDiv(docId, width.toLong) * width

  override def produceResult(input: InternalRow): java.lang.Long =
    java.lang.Long.valueOf(invoke(input.getInt(0), input.getLong(1)))
}

/** One-row local result relation for procedure output (Spark currently
  * requires procedure result scans to be [[LocalScan]]s — the summary
  * is driver-computed metadata, so local is also the honest shape). */
private[sources] final class SingleRowScan(schema: StructType, row: InternalRow)
    extends LocalScan {
  override def readSchema(): StructType = schema
  override def rows(): Array[InternalRow] = Array(row)
}

/** `<cat>.<table>.history` — the table's commit log as a queryable
  * METADATA TABLE (Iceberg's `t.history`, Delta's DESCRIBE HISTORY):
  * one row per version manifest, carrying the commit instant (the
  * manifest-embedded `#ts=`), the version's data/tombstone file
  * counts, its header-summed row count, and whether it still
  * reconstructs (later destructive verbs may have removed its files —
  * then `n_rows` is NULL and `reconstructable` false, the same honesty
  * contract as `VERSION AS OF`'s loud failure). History is manifest
  * listings + 28-byte headers: metadata-bounded at any scale, read
  * once at planning into a single local partition. */
private[sources] final class LedgerHistoryTable(path: String, name0: String)
    extends Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.types.{BooleanType, TimestampType}

  override def name(): String = name0
  override def schema(): StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false),
    StructField("n_data_files", LongType, nullable = false),
    StructField("n_delete_files", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = true),
    StructField("reconstructable", BooleanType, nullable = false)))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder =
    () => new LocalScan {
      override def readSchema(): StructType = schema()
      override def rows(): Array[InternalRow] =
        LedgerSource.listVersions(path).toArray.map { v =>
          val names = LedgerSource.readManifest(path, v)
          val (data, dels) = names.partition(_.endsWith(".gl"))
          val rows: java.lang.Long =
            try {
              val files = data.map(n => new File(new File(path), n))
              require(files.forall(_.isFile))
              java.lang.Long.valueOf(LedgerSource.statsOf(files).map(_._4).sum)
            } catch { case _: Exception => null }
          val row = new GenericInternalRow(6)
          row.setLong(0, v)
          row.setLong(1, LedgerSource.commitTimeMillis(path, v) * 1000L)
          row.setLong(2, data.length.toLong)
          row.setLong(3, dels.count(_.endsWith(".gd")).toLong)
          if (rows == null) row.setNullAt(4) else row.setLong(4, rows.longValue())
          row.setBoolean(5, rows != null)
          row
        }
    }
}

/** `<cat>.<table>.lineage` — the COMMIT GRAPH, queryable: one row per
  * version carrying its `#parent` header, the manifest-diff quantities
  * the change-feed planner computes (data rows / tombstone keys the
  * commit ADDED vs its parent — header and section arithmetic, no
  * record decodes), and `on_current`: whether the commit lies on the
  * parent chain of the current read's head (main's ref on a branched
  * table, the chain head otherwise). Interleaved branch commits and a
  * CAS loser's dead side commits show `on_current = false` — exactly
  * the rows an operator needs to SEE to understand a multi-lineage
  * chain. Tiny driver-side metadata, LocalScan like `.history`. */
private[sources] final class LedgerLineageTable(path: String, name0: String)
    extends Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.types.BooleanType

  override def name(): String = name0
  override def schema(): StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("parent", LongType, nullable = false),
    StructField("rows_added", LongType, nullable = true),
    StructField("tombstones_added", LongType, nullable = true),
    StructField("on_current", BooleanType, nullable = false)))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder =
    () => new LocalScan {
      override def readSchema(): StructType = schema()
      override def rows(): Array[InternalRow] = {
        val head = LedgerSource.readRef(path, "branch", "main")
          .orElse(LedgerSource.listVersions(path).lastOption)
        val current = scala.collection.mutable.Set.empty[Long]
        var c = head.getOrElse(0L)
        while (c > 0) {
          current += c
          val p = LedgerSource.parentVersion(path, c)
          if (p >= c) c = 0 else c = p
        }
        LedgerSource.listVersions(path).toArray.map { v =>
          val parent = LedgerSource.parentVersion(path, v)
          val names = LedgerSource.readManifest(path, v).toSet
          val prev: Set[String] =
            if (parent == 0) Set.empty
            else
              try LedgerSource.readManifest(path, parent).toSet
              catch { case _: Exception => null }
          val row = new GenericInternalRow(5)
          row.setLong(0, v)
          row.setLong(1, parent)
          if (prev == null) { row.setNullAt(2); row.setNullAt(3) }
          else {
            val added = (names -- prev).map(n => new File(new File(path), n))
            try {
              require(added.forall(_.isFile))
              val (data, dels) = added.partition(_.getName.endsWith(".gl"))
              row.setLong(2, LedgerSource.statsOf(data.toArray).map(_._4).sum)
              row.setLong(3, dels.toSeq
                .filter(_.getName.endsWith(".gd"))
                .map(LedgerSource.tombstoneTotal).sum)
            } catch { // the diff's files were reclaimed — report honestly
              case _: Exception => row.setNullAt(2); row.setNullAt(3)
            }
          }
          row.setBoolean(4, current.contains(v))
          row
        }
      }
    }
}

/** `<cat>.<table>.refs` — the table's TAGS and BRANCHES as a queryable
  * metadata table (Iceberg's `t.refs`): one row per ref with the
  * version it names and whether that version still reconstructs (a tag
  * can outlive its files under the vacuumed-table contract — the
  * listing says so instead of erroring, so operators can FIND the
  * dangling refs). Like `.history`, tiny driver-side metadata
  * materialized as a LocalScan. */
private[sources] final class LedgerRefsTable(path: String, name0: String)
    extends Table
    with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.types.BooleanType

  override def name(): String = name0
  override def schema(): StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("reconstructable", BooleanType, nullable = false)))
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: CaseInsensitiveStringMap): org.apache.spark.sql.connector.read.ScanBuilder =
    () => new LocalScan {
      override def readSchema(): StructType = schema()
      override def rows(): Array[InternalRow] =
        (LedgerSource.listRefs(path, "tag").toSeq.map(("tag", _)) ++
          LedgerSource.listRefs(path, "branch").toSeq.map(("branch", _)))
          .sortBy { case (k, (n, _)) => (k, n) }
          .map { case (kind, (refName, v)) =>
            val ok =
              try { LedgerSource.resolvePinned(path, v); true }
              catch { case _: Exception => false }
            val row = new GenericInternalRow(4)
            row.update(0, UTF8String.fromString(kind))
            row.update(1, UTF8String.fromString(refName))
            row.setLong(2, v)
            row.setBoolean(3, ok)
            row
          }.toArray
    }
}
