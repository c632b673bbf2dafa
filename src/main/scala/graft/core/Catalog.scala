package graft.core

import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.JsonDSL._

/** Git-like catalog: a single root pointer to a name → table mapping;
  * every statement produces a new immutable root, old roots stay valid
  * (structural sharing via content addressing) — the Repo layer analogue
  * (/root/reference/messdb-repo/src/MessDB/Repo.hs:43-130).
  */
final case class CatalogEntry(tableHash: String, keyCols: Seq[String],
    schemaJson: String)

final class Catalog(store: GraftStore) {

  /** loadRepoRoot: missing root ⇒ empty catalog (Repo.hs:84-89). */
  def root: Map[String, CatalogEntry] =
    store.currentRootHash.map(rootAt).getOrElse(Map.empty)

  def rootAt(rootHash: String): Map[String, CatalogEntry] = {
    implicit val fmts: Formats = DefaultFormats
    val j = JsonMethods.parse(store.loadRoot(rootHash)) \ "tables"
    j.extract[Map[String, JValue]].map { case (name, e) =>
      name -> CatalogEntry((e \ "table").extract[String],
        (e \ "keyCols").extract[Seq[String]],
        JsonMethods.compact(JsonMethods.render(e \ "schema")))
    }
  }

  /** saveRepoTable: upsert a named table, produce + install a new root
    * (Repo.hs:106-118). Returns the new root hash. */
  def put(name: String, ref: TableRef): String = {
    val m = store.loadTableMeta(ref.hash)
    statement(_ + (name -> CatalogEntry(ref.hash, m.keyCols, m.schemaJson)))
  }

  def drop(name: String): String = statement(_ - name)

  /** getRepoTable (point lookup in the catalog, Repo.hs:100-104). */
  def get(name: String): Option[TableRef] = root.get(name).map(e => TableRef(e.tableHash))

  def schemaOf(name: String): Option[org.apache.spark.sql.types.StructType] =
    root.get(name).map(e => org.apache.spark.sql.types.DataType
      .fromJson(e.schemaJson).asInstanceOf[org.apache.spark.sql.types.StructType])

  /** runRepoStatement: root → root, atomically installed (Repo.hs:120-130).
    * Each root records its parent, so the version history is a git-like
    * chain walkable from the current pointer.
    *
    * The read-modify-write of the root pointer is serialized on the store
    * instance so two concurrent in-process writers cannot both read the
    * same parent and silently drop one update (lost update). Cross-process
    * writers need an external lock on the store directory. */
  def statement(f: Map[String, CatalogEntry] => Map[String, CatalogEntry]): String = store.synchronized {
    val next = f(root)
    val parent = store.currentRootHash
    val tables: JObject = JObject(next.toList.sortBy(_._1).map { case (name, e) =>
      name -> (("table" -> e.tableHash) ~ ("keyCols" -> e.keyCols) ~
        ("schema" -> JsonMethods.parse(e.schemaJson)))
    })
    val j: JObject = ("tables" -> tables) ~ ("parent" -> parent)
    store.saveRoot(JsonMethods.compact(JsonMethods.render(j)))
  }

  /** Parent of a root version: None for the first root, and None when
    * the parent was garbage-collected (the chain is then shallow, like
    * a git shallow clone — the kept root stays fully usable). */
  def parentOf(rootHash: String): Option[String] = {
    implicit val fmts: Formats = DefaultFormats
    (JsonMethods.parse(store.loadRoot(rootHash)) \ "parent").extractOpt[String]
      .filter(store.hasRoot)
  }

  /** Version history from the current root, newest first; stops at the
    * first GC'd ancestor. */
  def log(limit: Int = 100): Seq[String] = {
    val out = Vector.newBuilder[String]
    var cur = store.currentRootHash.filter(store.hasRoot)
    var n = 0
    while (cur.isDefined && n < limit) {
      out += cur.get
      cur = parentOf(cur.get)
      n += 1
    }
    out.result()
  }

  /** Move the root pointer to an existing version (git checkout; the old
    * chain stays content-addressed and reachable by hash). */
  def checkout(rootHash: String): Unit = {
    store.loadRoot(rootHash) // validate existence
    store.setRootPointer(rootHash)
  }
}
