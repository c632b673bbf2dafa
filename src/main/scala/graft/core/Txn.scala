package graft.core

import java.nio.file.Path

/** Optimistic transactions over the git-like root chain.
  *
  * The reference's repo model is "every statement produces a new root"
  * (/root/reference/messdb-repo/src/MessDB/Repo.hs:120-130); a
  * transaction generalizes that to "every TRANSACTION produces a new
  * root". Mechanically it is the git workflow: statements inside the
  * transaction run against a PRIVATE root pointer (a branch), and
  * COMMIT publishes the accumulated state as ONE new version whose
  * parent is the transaction's start version (a squash merge), installed
  * with an optimistic compare-and-set on the shared pointer — if another
  * writer advanced the store meanwhile, the commit refuses and nothing
  * is published. ROLLBACK simply discards the private pointer.
  *
  * Data objects written during the transaction (chunks, table metas,
  * staged roots, memos) go straight into the underlying content-addressed
  * store: they are write-once and unreachable until the commit publishes
  * a root that references them, so an aborted transaction leaves only
  * unreferenced objects for GC — exactly git's model of orphaned
  * objects. Isolation follows from content addressing: concurrent
  * readers hold the old root and never observe staged state.
  */
final class TxnStore(val inner: GraftStore) extends GraftStore {

  /** The shared pointer at transaction start — the CAS expectation. */
  val startPtr: Option[String] = inner.currentRootHash

  @volatile private var ptr: Option[String] = startPtr

  override def chunkCodec: String = inner.chunkCodec

  // ---- content-addressed paths: straight delegation --------------------
  def chunkPath(hash: String): String = inner.chunkPath(hash)
  def hasChunk(hash: String): Boolean = inner.hasChunk(hash)
  def saveChunk(hash: String, producedFile: Path): Unit =
    inner.saveChunk(hash, producedFile)
  override def saveChunks(batch: Seq[(String, Path)]): Unit =
    inner.saveChunks(batch)
  def saveTableMeta(meta: TableMeta): String = inner.saveTableMeta(meta)
  def loadTableMeta(tableHash: String): TableMeta = inner.loadTableMeta(tableHash)
  def hasTable(tableHash: String): Boolean = inner.hasTable(tableHash)
  override def tableEnvelope(tableHash: String): (String, Seq[String], Long, Long) =
    inner.tableEnvelope(tableHash)
  override def chunkStream(tableHash: String): () => Iterator[ChunkMeta] =
    inner.chunkStream(tableHash)
  def memoGet(opHash: String): Option[String] = inner.memoGet(opHash)
  def memoPut(opHash: String, resultHash: String): Unit =
    inner.memoPut(opHash, resultHash)

  // ---- root pointer: private to the transaction ------------------------
  /** Root OBJECTS are shared (content-addressed, harmless before a
    * pointer references them); only the POINTER is transaction-local.
    * putRootObject never touches the shared pointer, so staged state is
    * invisible to concurrent readers and a crash mid-transaction leaves
    * only an unreferenced root object for GC — never a published one. */
  def putRootObject(json: String): String = inner.putRootObject(json)

  def saveRoot(json: String): String = {
    val h = inner.putRootObject(json)
    ptr = Some(h)
    h
  }
  def setRootPointer(rootHash: String): Unit = { ptr = Some(rootHash) }
  def clearRootPointer(): Unit = { ptr = None }
  def currentRootHash: Option[String] = ptr
  def loadRoot(rootHash: String): String = inner.loadRoot(rootHash)
  def hasRoot(rootHash: String): Boolean = inner.hasRoot(rootHash)

  // ---- GC surface: delegation ------------------------------------------
  def listRoots: Seq[String] = inner.listRoots
  def listTables: Seq[String] = inner.listTables
  def listChunks: Seq[String] = inner.listChunks
  def listMemos: Seq[(String, String)] = inner.listMemos
  def deleteRoot(hash: String): Unit = inner.deleteRoot(hash)
  def deleteTable(hash: String): Unit = inner.deleteTable(hash)
  def deleteChunk(hash: String): Unit = inner.deleteChunk(hash)
  def deleteMemo(opHash: String): Unit = inner.deleteMemo(opHash)
}

/** A concurrent writer advanced the store between BEGIN and COMMIT. */
final class TxnConflictException(msg: String) extends RuntimeException(msg)

object Txn {

  /** Open a transaction: a private branch of the shared pointer. */
  def begin(inner: GraftStore): TxnStore = new TxnStore(inner)

  /** Publish the transaction as ONE new version (squash): the new root
    * carries the staged head's tables and view definitions, its parent
    * is the start version, and the shared pointer moves to it under an
    * optimistic CAS. Returns the published root hash, or the unchanged
    * current root when the transaction made no statements.
    *
    * @throws TxnConflictException when the shared pointer moved since
    *   BEGIN — nothing is published; the caller can retry the whole
    *   transaction against the new state. */
  def commit(txn: TxnStore): String = txn.inner.synchronized {
    if (txn.inner.currentRootHash != txn.startPtr)
      throw new TxnConflictException(
        s"store advanced from ${txn.startPtr.getOrElse("<empty>")} to " +
          s"${txn.inner.currentRootHash.getOrElse("<empty>")} during the transaction")
    if (txn.currentRootHash == txn.startPtr)
      return txn.startPtr.getOrElse("") // empty txn on an empty store: no-op
    val staged = new Catalog(txn)
    val (tables, views) = (staged.root, staged.viewDefs)
    // Catalog.statementFull reads the parent from inner's pointer — the
    // CAS above pinned it to startPtr, so this IS the squash merge.
    new Catalog(txn.inner).statementFull(_ => tables, _ => views)
  }
}
