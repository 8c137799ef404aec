package graft.sources

import java.io.File

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException,
  NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table,
  TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

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
class GraftCatalog extends TableCatalog {
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
    if (!cleanSegments(ident) || !d.isDirectory)
      throw new NoSuchTableException(ident)
    new LedgerTable(d.getPath)
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
    new LedgerTable(d.getPath)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft-ledger tables have a fixed schema — ALTER TABLE is not supported")

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
