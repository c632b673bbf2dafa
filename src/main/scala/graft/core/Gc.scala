package graft.core


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

    // ---- sweep (backend-agnostic: the GraftStore enumeration surface)
    def sweep(listed: Seq[String], keep: String => Boolean,
        delete: String => Unit): Int =
      listed.count { h => if (!keep(h)) { delete(h); true } else false }
    val delRoots = sweep(store.listRoots, roots.contains, store.deleteRoot)
    val delTables = sweep(store.listTables, tables.contains, store.deleteTable)
    val delChunks = sweep(store.listChunks, chunks.contains, store.deleteChunk)
    // memo values must point at surviving tables
    val delMemos = store.listMemos.count { case (op, target) =>
      if (!tables.contains(target)) { store.deleteMemo(op); true } else false
    }
    GcStats(roots.size, tables.size, chunks.size,
      delRoots, delTables, delChunks, delMemos)
  }
}
