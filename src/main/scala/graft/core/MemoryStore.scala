package graft.core

import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicReference
import scala.collection.concurrent.TrieMap

/** Pure in-memory backend — the Store/Memory.hs parity line
  * (/root/reference/messdb-base/src/MessDB/Store/Memory.hs:14-38, an
  * IORef of maps): chunk bytes, table metas, memo entries, and roots
  * live in concurrent maps; dropping the store drops the state. What
  * library users want for unit tests (no tmpdir, no cleanup) and for
  * ephemeral pipelines.
  *
  * One concession to the execution engine: Spark reads chunks as
  * parquet FILES, so [[chunkPath]] lazily spills the requested chunk's
  * bytes into a disposable temp cache — the same extract-cache shape
  * [[PackStore]] uses. The cache is derived state: the authoritative
  * bytes are the in-memory map, and the cache directory dies with the
  * JVM (DELETE_ON_EXIT is not needed — it lives under the system tmp
  * dir and holds nothing durable).
  */
final class MemoryStore extends GraftStore {

  private val chunks = TrieMap.empty[String, Array[Byte]]
  private val tables = TrieMap.empty[String, TableMeta]
  private val memos = TrieMap.empty[String, String]
  private val roots = TrieMap.empty[String, String]
  private val pointer = new AtomicReference[Option[String]](None)

  private lazy val spillDir: Path = {
    val p = Files.createTempDirectory("graft-mem-spill-")
    FsUtil.deleteAtExit(p) // throwaway scratch — never outlives the JVM
    p
  }

  // ---- chunk store -----------------------------------------------------
  def chunkPath(hash: String): String = {
    val p = spillDir.resolve(s"$hash.parquet")
    chunks.get(hash).foreach { bytes =>
      if (!Files.exists(p)) {
        val tmp = p.resolveSibling(
          p.getFileName.toString + ".tmp-" + java.util.UUID.randomUUID)
        Files.write(tmp, bytes)
        try Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            Files.deleteIfExists(tmp); ()
        }
      }
    }
    p.toString
  }

  def hasChunk(hash: String): Boolean = chunks.contains(hash)

  def saveChunk(hash: String, producedFile: Path): Unit = {
    if (chunks.contains(hash)) {
      stats.chunkSkips.incrementAndGet()
      Files.deleteIfExists(producedFile); ()
    } else {
      stats.chunkSaves.incrementAndGet()
      val bytes = Files.readAllBytes(producedFile)
      chunks.putIfAbsent(hash, bytes)
      Files.deleteIfExists(producedFile) // consume, like every backend
      ()
    }
  }

  // ---- table meta ------------------------------------------------------
  def saveTableMeta(meta: TableMeta): String = {
    val hash = meta.tableHash
    if (tables.putIfAbsent(hash, meta).isEmpty) {
      stats.metaSaves.incrementAndGet(); ()
    }
    hash
  }

  def loadTableMeta(tableHash: String): TableMeta =
    tables.getOrElse(tableHash,
      throw new java.util.NoSuchElementException(s"no such table: $tableHash"))

  def hasTable(tableHash: String): Boolean = tables.contains(tableHash)

  // ---- memo store ------------------------------------------------------
  def memoGet(opHash: String): Option[String] = memos.get(opHash) match {
    case some @ Some(_) => stats.memoHits.incrementAndGet(); some
    case None => stats.memoMisses.incrementAndGet(); None
  }

  def memoPut(opHash: String, resultHash: String): Unit = {
    memos.putIfAbsent(opHash, resultHash); ()
  }

  // ---- root pointer ----------------------------------------------------
  def putRootObject(json: String): String = {
    val hash = Hashing.sha256Hex(json.getBytes(StandardCharsets.UTF_8))
    roots.putIfAbsent(hash, json)
    hash
  }

  def saveRoot(json: String): String = {
    val hash = putRootObject(json)
    pointer.set(Some(hash))
    hash
  }

  def setRootPointer(rootHash: String): Unit = pointer.set(Some(rootHash))
  def clearRootPointer(): Unit = pointer.set(None)
  def currentRootHash: Option[String] = pointer.get()

  def loadRoot(rootHash: String): String =
    roots.getOrElse(rootHash,
      throw new java.util.NoSuchElementException(s"no such root: $rootHash"))

  def hasRoot(rootHash: String): Boolean = roots.contains(rootHash)

  // ---- enumeration + deletion (GC surface) -----------------------------
  def listRoots: Seq[String] = roots.keys.toSeq
  def listTables: Seq[String] = tables.keys.toSeq
  def listChunks: Seq[String] = chunks.keys.toSeq
  def listMemos: Seq[(String, String)] = memos.toSeq

  def deleteRoot(hash: String): Unit = { roots.remove(hash); () }
  def deleteTable(hash: String): Unit = { tables.remove(hash); () }
  def deleteChunk(hash: String): Unit = {
    chunks.remove(hash)
    Files.deleteIfExists(Paths.get(spillDir.resolve(s"$hash.parquet").toString))
    ()
  }
  def deleteMemo(opHash: String): Unit = { memos.remove(opHash); () }
}
