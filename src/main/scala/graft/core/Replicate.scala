package graft.core

final case class ReplicateStats(copiedRoots: Int, copiedTables: Int,
    copiedChunks: Int, skippedChunks: Int)

/** Git-push-style incremental replication between stores: copy the
  * objects reachable from a root that the destination does NOT already
  * have. Content addressing makes this trivially correct and trivially
  * incremental — an object's name proves its content, so presence at
  * the destination means the bytes are already right, and a second push
  * of an unchanged root copies nothing. Structural sharing makes it
  * cheap: pushing a new version after a small delta moves only the
  * delta's chunks (the same chunks an incremental merge rewrote).
  *
  * This is the cross-store sync story (backup, promotion dev→prod,
  * fan-out to a read replica) on top of the [[GraftStore]] contract
  * alone — it works between any backend pair (fs ↔ object-store ↔
  * pack) because it only speaks the trait.
  *
  * Memo entries are NOT replicated: they are a compute cache keyed by
  * operation hashes, correct to rebuild and wrong to trust across
  * stores whose table universes differ (a memo pointing at a table the
  * destination never receives would dangle — exactly the invariant Gc
  * maintains locally).
  *
  * The root-history chain replicates up to `depth` ancestors (git
  * shallow-clone semantics); the destination's root pointer moves only
  * when `advancePointer` is set AND the destination pointer is absent
  * or part of the pushed chain (no silent overwrite of a diverged
  * destination — the fast-forward rule).
  */
object Replicate {

  def push(src: GraftStore, dst: GraftStore, rootHash: String,
      depth: Int = Int.MaxValue, advancePointer: Boolean = true): ReplicateStats = {
    require(src.hasRoot(rootHash), s"unknown source root: $rootHash")
    val srcCat = new Catalog(src)

    // the pushed chain: rootHash and up to depth-1 ancestors
    val chain = Vector.newBuilder[String]
    var cur: Option[String] = Some(rootHash)
    var n = 0
    while (cur.isDefined && n < depth) {
      chain += cur.get
      cur = srcCat.parentOf(cur.get)
      n += 1
    }
    val roots = chain.result()

    val tables = scala.collection.mutable.LinkedHashSet.empty[String]
    roots.foreach { r =>
      srcCat.rootAt(r).values.foreach(e => tables += e.tableHash)
    }

    var copiedChunks = 0
    var skippedChunks = 0
    var copiedTables = 0
    tables.foreach { t =>
      val meta = src.loadTableMeta(t)
      // chunks first, meta last: a table hash present at the destination
      // always names a COMPLETE table (crash-safe ordering)
      val missing = meta.chunks.filterNot(c => dst.hasChunk(c.hash))
      skippedChunks += meta.chunks.length - missing.length
      if (missing.nonEmpty) {
        // saveChunks CONSUMES its input files (tmp+rename discipline), so
        // hand it disposable copies, never the source store's own files
        dst.saveChunks(missing.map { c =>
          val tmp = java.nio.file.Files.createTempFile("graft-push-", ".parquet")
          java.nio.file.Files.copy(
            java.nio.file.Paths.get(src.chunkPath(c.hash)), tmp,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          c.hash -> tmp
        })
        copiedChunks += missing.length
      }
      if (!dst.hasTable(t)) {
        dst.saveTableMeta(meta)
        copiedTables += 1
      }
    }

    val dstHeadBefore = dst.currentRootHash

    // roots oldest-first so every parent exists before its child;
    // putRootObject never moves the destination pointer, so a failure
    // mid-copy leaves the head exactly where it was (including the
    // NO-pointer state of a fresh store) with only orphaned objects
    var copiedRoots = 0
    roots.reverse.foreach { r =>
      if (!dst.hasRoot(r)) {
        val saved = dst.putRootObject(src.loadRoot(r))
        require(saved == r,
          s"root hash diverged across stores: $r vs $saved")
        copiedRoots += 1
      }
    }

    val fastForward = dstHeadBefore.isEmpty ||
      dstHeadBefore.exists(roots.contains) ||
      dstHeadBefore.exists { h =>
        // dst head is an ancestor reachable from the pushed root (the
        // full chain exists at the destination now)
        var c: Option[String] = Some(rootHash)
        var found = false
        val dstCat = new Catalog(dst)
        while (c.isDefined && !found) {
          if (c.get == h) found = true else c = dstCat.parentOf(c.get)
        }
        found
      }
    if (advancePointer && fastForward) dst.setRootPointer(rootHash)
    else {
      require(!advancePointer,
        s"destination root ${dstHeadBefore.getOrElse("?")} is not in the " +
          "pushed history — refusing a non-fast-forward pointer move " +
          "(objects were still replicated)")
    }

    ReplicateStats(copiedRoots, copiedTables, copiedChunks, skippedChunks)
  }
}
