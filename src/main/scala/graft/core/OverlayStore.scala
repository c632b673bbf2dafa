package graft.core

import java.nio.file.Path

/** Copy-on-write BRANCH of a content-addressed store: reads fall
  * through `local` → `base`, every write lands in `local`, and `base`
  * is NEVER mutated. Because chunks, table metas, and root objects are
  * all addressed by content hash, a union of two stores is trivially
  * consistent — an object resolves identically wherever it lives — so
  * branching costs ZERO copies regardless of base size. This is the
  * store-level analogue of the catalog's root-pointer branching
  * (TxnStore): where a transaction branches the POINTER within one
  * store, an overlay branches the whole OBJECT SPACE across stores.
  *
  * Uses: throwaway experiment branches over a shared immutable corpus
  * store (the bench's per-run isolation — replaces hardlink-cloning
  * hundreds of chunk files per run); a writable scratch layer over a
  * read-only/archival replica; staging a batch of materializations for
  * later [[Replicate]] into the base.
  *
  * Semantics and caveats:
  *  - the branch's root POINTER lives in `local` only; on construction
  *    it is initialized to the base's current root (the branch starts
  *    where the base is, like `git checkout -b`);
  *  - memo entries resolve local-first; a memo hit from base may name a
  *    table whose objects also resolve from base — the liveness checks
  *    ([[FsUtil.memoizedLiveTable]]) work unchanged through fallback;
  *  - deletes touch `local` only: an object also present in base stays
  *    reachable — GC over an overlay can only reclaim branch-private
  *    objects, never shared history (the safe default for a shared
  *    base);
  *  - `stats` is the LOCAL store's instance, so write-volume assertions
  *    (O(delta) patch pins) measure exactly the branch's new objects.
  *
  * The reference's store algebra composes wrappers the same way
  * (/root/reference/messdb-base/src/MessDB/Store/Debug.hs:7-38 wraps
  * any store); the overlay is that composition pattern applied to the
  * union of two stores. */
final class OverlayStore(val base: GraftStore, val local: GraftStore)
    extends GraftStore {
  override val stats: StoreStats = local.stats
  override def chunkCodec: String = local.chunkCodec

  // the branch starts at the base's current version
  if (local.currentRootHash.isEmpty)
    base.currentRootHash.foreach(local.setRootPointer)

  def chunkPath(hash: String): String =
    if (local.hasChunk(hash)) local.chunkPath(hash)
    else if (base.hasChunk(hash)) base.chunkPath(hash)
    else local.chunkPath(hash) // where it WOULD live (missing either way)
  def hasChunk(hash: String): Boolean =
    local.hasChunk(hash) || base.hasChunk(hash)
  def saveChunk(hash: String, producedFile: Path): Unit =
    // idempotence across layers: a chunk already visible from base is
    // NOT rewritten into local (content addressing makes the base copy
    // indistinguishable), preserving the bytes-for-keys contract
    if (base.hasChunk(hash)) {
      stats.chunkSkips.incrementAndGet()
      java.nio.file.Files.deleteIfExists(producedFile); ()
    } else local.saveChunk(hash, producedFile)
  override def saveChunks(batch: Seq[(String, Path)]): Unit = {
    val (inBase, fresh) = batch.partition { case (h, _) => base.hasChunk(h) }
    inBase.foreach { case (_, p) =>
      stats.chunkSkips.incrementAndGet()
      java.nio.file.Files.deleteIfExists(p)
    }
    if (fresh.nonEmpty) local.saveChunks(fresh)
  }

  def saveTableMeta(meta: TableMeta): String =
    if (base.hasTable(meta.tableHash)) meta.tableHash
    else local.saveTableMeta(meta)
  def loadTableMeta(tableHash: String): TableMeta =
    if (local.hasTable(tableHash)) local.loadTableMeta(tableHash)
    else base.loadTableMeta(tableHash)
  def hasTable(tableHash: String): Boolean =
    local.hasTable(tableHash) || base.hasTable(tableHash)
  override def tableEnvelope(tableHash: String): (String, Seq[String], Long, Long) =
    if (local.hasTable(tableHash)) local.tableEnvelope(tableHash)
    else base.tableEnvelope(tableHash)
  override def chunkStream(tableHash: String): () => Iterator[ChunkMeta] =
    if (local.hasTable(tableHash)) local.chunkStream(tableHash)
    else base.chunkStream(tableHash)

  def memoGet(opHash: String): Option[String] =
    local.memoGet(opHash).orElse(base.memoGet(opHash))
  def memoPut(opHash: String, resultHash: String): Unit =
    local.memoPut(opHash, resultHash)
  override def memoDel(opHash: String): Unit = local.memoDel(opHash)

  def putRootObject(json: String): String = local.putRootObject(json)
  def saveRoot(json: String): String = local.saveRoot(json)
  def setRootPointer(rootHash: String): Unit = local.setRootPointer(rootHash)
  def clearRootPointer(): Unit = local.clearRootPointer()
  def currentRootHash: Option[String] = local.currentRootHash
  def loadRoot(rootHash: String): String =
    if (local.hasRoot(rootHash)) local.loadRoot(rootHash)
    else base.loadRoot(rootHash)
  def hasRoot(rootHash: String): Boolean =
    local.hasRoot(rootHash) || base.hasRoot(rootHash)

  def listRoots: Seq[String] = (local.listRoots ++ base.listRoots).distinct
  def listTables: Seq[String] = (local.listTables ++ base.listTables).distinct
  def listChunks: Seq[String] = (local.listChunks ++ base.listChunks).distinct
  def listMemos: Seq[(String, String)] = {
    val l = local.listMemos
    val seen = l.map(_._1).toSet
    l ++ base.listMemos.filterNot(m => seen(m._1))
  }
  // deletes are branch-local by design: shared base history is immutable
  def deleteRoot(hash: String): Unit = local.deleteRoot(hash)
  def deleteTable(hash: String): Unit = local.deleteTable(hash)
  def deleteChunk(hash: String): Unit = local.deleteChunk(hash)
  def deleteMemo(opHash: String): Unit = local.deleteMemo(opHash)
}
