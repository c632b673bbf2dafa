package graft.core

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

final case class GcStats(keptRoots: Int, keptTables: Int, keptChunks: Int,
    deletedRoots: Int, deletedTables: Int, deletedChunks: Int,
    deletedMemos: Int)

/** Mark-and-sweep garbage collection over the content-addressed store.
  *
  * The reference never deletes (content-addressed stores grow forever —
  * its SQLite/LMDB stores have no delete path at all); at 100 TB the
  * version history pins real money, so GC is part of the lifecycle:
  * old roots are dropped explicitly and everything unreachable goes.
  *
  * Mark: the kept roots' catalogs → their table metas → their chunk
  * hashes. Structural sharing does the pruning work: a chunk shared by
  * an old and a new table version is reachable through the new root and
  * survives; only chunks exclusive to dropped history are deleted.
  *
  * Memo entries are kept only when their result table survives —
  * a memo hit must never return a dangling table hash. Sweeping an
  * intermediate (memo-only) table therefore also drops the memo rows
  * that produced it: GC trades incremental-recompute cache for space,
  * never correctness.
  *
  * Single-writer assumption: run GC from the (sole) process that owns
  * the store, not concurrently with writers — standard for object-store
  * table formats (cf. snapshot-expiry maintenance jobs).
  */
object Gc {

  /** Collect everything unreachable from `keepRoots` (the current root
    * pointer is always kept). Returns kept/deleted counts. */
  def run(store: GraftStore, keepRoots: Seq[String]): GcStats = {
    val catalog = new Catalog(store)
    val unknown = keepRoots.filterNot(store.hasRoot)
    require(unknown.isEmpty,
      s"unknown root(s) in keepRoots (mistyped or already GC'd): ${unknown.mkString(", ")}")
    val roots = (store.currentRootHash.toSeq ++ keepRoots).distinct

    // ---- mark
    val tables = scala.collection.mutable.Set.empty[String]
    roots.foreach { r =>
      catalog.rootAt(r).values.foreach(e => tables += e.tableHash)
    }
    val chunks = scala.collection.mutable.Set.empty[String]
    tables.foreach { t =>
      store.loadTableMeta(t).chunks.foreach(c => chunks += c.hash)
    }

    // ---- sweep
    val dir = Paths.get(store.rootDir)
    def sweep(sub: String, strip: String, keep: String => Boolean): Int = {
      var n = 0
      FsUtil.listDir(dir.resolve(sub)).foreach { p =>
        val name = p.getFileName.toString
        if (name.endsWith(strip) && !name.contains(".tmp-")) {
          val hash = name.stripSuffix(strip)
          if (!keep(hash)) { Files.deleteIfExists(p); n += 1 }
        }
      }
      n
    }
    val delRoots = sweep("roots", ".json", roots.contains)
    val delTables = sweep("tables", ".json", tables.contains)
    val delChunks = sweep("chunks", ".parquet", chunks.contains)
    // memo values must point at surviving tables
    var delMemos = 0
    FsUtil.listDir(dir.resolve("memo")).foreach { p =>
      if (!p.getFileName.toString.contains(".tmp-")) {
        val target = Files.readString(p).trim
        if (!tables.contains(target)) { Files.deleteIfExists(p); delMemos += 1 }
      }
    }
    GcStats(roots.size, tables.size, chunks.size,
      delRoots, delTables, delChunks, delMemos)
  }
}
