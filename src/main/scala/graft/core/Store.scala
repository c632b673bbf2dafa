package graft.core

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.concurrent.atomic.AtomicLong

/** Content-addressed store + memo store + root pointer, on a filesystem
  * directory. Mirrors the reference's Store/MemoStore/RepoStore contracts:
  *   - idempotent save: producing work is skipped when the key exists
  *     (/root/reference/messdb-base/src/MessDB/Store.hs:28-30)
  *   - memo: operation-hash → result-hash small-value cache (Store.hs:32-37)
  *   - single mutable root, atomically replaced via tmp+rename
  *     (/root/reference/messdb-base/src/MessDB/Store/File.hs:15-27,
  *      /root/reference/messdb-repo/src/MessDB/Repo.hs:75-98)
  *
  * Layout under `root/`:
  *   chunks/<sha256>.parquet   immutable PK-sorted row chunks
  *   tables/<sha256>.json      table meta (schema, key cols, chunk list)
  *   memo/<sha256>             op-hash → result table hash
  *   root                      current catalog root hash (pointer file)
  *   roots/<sha256>.json       catalog versions (content-addressed)
  *
  * On a cluster this directory lives on shared storage (object store /
  * DFS); every path below is write-once except `root`.
  */
final class GraftStore(val rootDir: String) {
  private val root = Paths.get(rootDir)
  Seq("chunks", "tables", "memo", "roots").foreach { d =>
    Files.createDirectories(root.resolve(d))
  }

  /** Observable counters — the Store/Stat.hs analogue
    * (/root/reference/messdb-base/src/MessDB/Store/Stat.hs:31-52). */
  object stats {
    val chunkSaves = new AtomicLong
    val chunkSkips = new AtomicLong // idempotent save: key already present
    val metaSaves = new AtomicLong
    val memoHits = new AtomicLong
    val memoMisses = new AtomicLong
    def snapshot: Map[String, Long] = Map(
      "chunkSaves" -> chunkSaves.get, "chunkSkips" -> chunkSkips.get,
      "metaSaves" -> metaSaves.get,
      "memoHits" -> memoHits.get, "memoMisses" -> memoMisses.get)
    def reset(): Unit = Seq(chunkSaves, chunkSkips, metaSaves, memoHits,
      memoMisses).foreach(_.set(0))
  }

  def chunkPath(hash: String): String =
    root.resolve("chunks").resolve(s"$hash.parquet").toString

  def hasChunk(hash: String): Boolean = Files.exists(Paths.get(chunkPath(hash)))

  /** Move a produced file into the store under its content hash.
    * Idempotent: if the hash is already present the new file is discarded —
    * same bytes-for-keys guarantee as the reference's storeSave. */
  def saveChunk(hash: String, producedFile: Path): Unit = {
    val dst = Paths.get(chunkPath(hash))
    if (Files.exists(dst)) { stats.chunkSkips.incrementAndGet(); Files.deleteIfExists(producedFile); () }
    else {
      stats.chunkSaves.incrementAndGet()
      val tmp = dst.resolveSibling(dst.getFileName.toString + ".tmp-" + java.util.UUID.randomUUID)
      Files.move(producedFile, tmp, StandardCopyOption.REPLACE_EXISTING)
      try Files.move(tmp, dst, StandardCopyOption.ATOMIC_MOVE)
      catch { case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp) }
      ()
    }
  }

  /** Store meta under its content identity (meta.tableHash). */
  def saveTableMeta(meta: TableMeta): String = {
    val hash = meta.tableHash
    val p = root.resolve("tables").resolve(s"$hash.json")
    if (!Files.exists(p)) {
      stats.metaSaves.incrementAndGet()
      writeAtomic(p, meta.toJson)
    }
    hash
  }

  def loadTableMeta(tableHash: String): TableMeta = {
    val p = root.resolve("tables").resolve(s"$tableHash.json")
    TableMeta.fromJson(Files.readString(p))
  }

  def hasTable(tableHash: String): Boolean =
    Files.exists(root.resolve("tables").resolve(s"$tableHash.json"))

  // ---- memo store ------------------------------------------------------

  def memoGet(opHash: String): Option[String] = {
    val p = root.resolve("memo").resolve(opHash)
    if (Files.exists(p)) { stats.memoHits.incrementAndGet(); Some(Files.readString(p).trim) }
    else { stats.memoMisses.incrementAndGet(); None }
  }

  def memoPut(opHash: String, resultHash: String): Unit = {
    val p = root.resolve("memo").resolve(opHash)
    if (!Files.exists(p)) writeAtomic(p, resultHash)
  }

  /** Memoized computation: the reference's `memoize`
    * (/root/reference/messdb-base/src/MessDB/Trie.hs:280-295). */
  def memoized(opHash: String)(compute: => String): String =
    memoGet(opHash) match {
      case Some(h) => h
      case None => val h = compute; memoPut(opHash, h); h
    }

  // ---- root pointer ----------------------------------------------------

  def saveRoot(json: String): String = {
    val hash = Hashing.sha256Hex(json.getBytes(StandardCharsets.UTF_8))
    val p = root.resolve("roots").resolve(s"$hash.json")
    if (!Files.exists(p)) writeAtomic(p, json)
    writeAtomic(root.resolve("root"), hash)
    hash
  }

  /** Repoint `root` to an existing version (checkout). */
  def setRootPointer(rootHash: String): Unit =
    writeAtomic(root.resolve("root"), rootHash)

  def currentRootHash: Option[String] = {
    val p = root.resolve("root")
    if (Files.exists(p)) Some(Files.readString(p).trim) else None
  }

  def loadRoot(rootHash: String): String =
    Files.readString(root.resolve("roots").resolve(s"$rootHash.json"))

  def hasRoot(rootHash: String): Boolean =
    Files.exists(root.resolve("roots").resolve(s"$rootHash.json"))

  private def writeAtomic(p: Path, content: String): Unit = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp-" + java.util.UUID.randomUUID)
    Files.writeString(tmp, content)
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }
}

/** Small filesystem helpers shared across the store layer. */
object FsUtil {
  /** Directory listing with the stream closed deterministically
    * (Files.list leaks an fd per call otherwise). */
  def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.toArray.map(_.asInstanceOf[Path]).toSeq
    finally s.close()
  }
}

object Hashing {
  def sha256Hex(bytes: Array[Byte]): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(bytes)
    val sb = new StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
  def sha256Hex(parts: Seq[Array[Byte]]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    parts.foreach(md.update)
    val d = md.digest()
    val sb = new StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
  /** Operation-hash builder: each part is length-prefixed so distinct
    * part splits can never concatenate to the same byte stream (e.g.
    * ("ab","x") vs ("a","bx")) — op identities must be injective in
    * their components or the memo store returns wrong results. */
  def opHash(parts: Seq[String]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    parts.foreach { p =>
      val b = p.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      md.update(java.nio.ByteBuffer.allocate(4).putInt(b.length).array())
      md.update(b)
    }
    val d = md.digest()
    val sb = new StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  def hex(bytes: Array[Byte]): String = {
    val sb = new StringBuilder(bytes.length * 2)
    bytes.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }
  def unhex(s: String): Array[Byte] =
    s.grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray

  /** Unsigned lexicographic byte-array compare (matches Spark's
    * BinaryType ordering). */
  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }
}
