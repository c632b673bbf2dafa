package graft.core

/** Named materialized views with memoized incremental refresh — the
  * project's north star stated as an API: Spark computes the refresh,
  * the op-hash layer does the Nix-style dependency tracking.
  *
  * A view = (source table name, transform, fold). `refresh` looks up the
  * source's CURRENT ref in the catalog and runs the memoized transform:
  *  - source unchanged since last refresh → the op hash is unchanged →
  *    whole-op memo hit, zero Spark jobs;
  *  - source updated by a small delta → key-preserving transforms
  *    recompute only the chunks the delta touched (per-chunk memo);
  *  - the view's new version lands in the catalog like any table (old
  *    versions stay addressable through root history).
  * There is no change tracking, no invalidation protocol, and no
  * freshness metadata — the operation hash IS the dependency
  * fingerprint, exactly the reference's memoization story
  * (/root/reference/messdb-base/src/MessDB/Trie.hs:280-312).
  */
final class Views(ops: Ops, catalog: Catalog) {
  import org.apache.spark.sql.functions.{col, lit}
  import Views.{ViewDef, JoinDef}

  private val defs =
    scala.collection.concurrent.TrieMap.empty[String, ViewDef]
  private val joinDefs =
    scala.collection.concurrent.TrieMap.empty[String, JoinDef]

  /** Register a view WITHOUT materializing — used when a batch of view
    * definitions (e.g. rebuilt from the catalog's persisted SQL defs)
    * must all be known before [[refreshAll]] orders them. */
  def declare(view: String, source: String, transform: ColTransform,
      fold: FoldSpec = FoldSpec.FoldLast): Unit = {
    defs.put(view, ViewDef(source, transform, fold)); ()
  }

  /** [[declare]] for keyed join views. */
  def declareJoin(view: String, left: String, right: String,
      presence: Boolean = false): Unit = {
    joinDefs.put(view, JoinDef(left, right, presence)); ()
  }

  /** Register a view and materialize its first version. */
  def define(view: String, source: String, transform: ColTransform,
      fold: FoldSpec = FoldSpec.FoldLast): TableRef = {
    declare(view, source, transform, fold)
    refresh(view)
  }

  /** Register a keyed JOIN view: the full-outer equi-join of two tables
    * on their (identical) primary key, maintained incrementally. The
    * join is ONE aligned merge ([[Ops.mergeAligned]]): each side is
    * projected into the joint schema (the other side's columns as typed
    * nulls) AT READ TIME inside the region-memoized merge under
    * [[FoldSpec.FoldCoalesce]] — no widened copy is ever materialized.
    * A first build is a single read+shuffle+write pass; a delta to
    * either side refreshes in O(delta): only dirty key regions
    * re-merge, and the result hash-equals the from-scratch build
    * (content-defined chunking). Inner-join consumers filter the
    * absent-side nulls downstream. */
  def defineJoin(view: String, left: String, right: String): TableRef = {
    declareJoin(view, left, right)
    refresh(view)
  }

  /** Re-materialize from the source's current catalog version. Cost is
    * zero (memo hit) when the source hash is unchanged, O(touched
    * chunks) after a delta for key-preserving transforms. A source that
    * is ITSELF a declared view refreshes first (recursively), so a
    * single-view refresh of a chained view observes fresh sources —
    * refreshing an already-fresh source is a memo hit and mints no
    * root, so over-refreshing costs nothing. */
  def refresh(view: String): TableRef = refresh(view, Set.empty)

  private def refresh(view: String, visiting: Set[String]): TableRef = {
    require(!visiting.contains(view), s"view dependency cycle at $view")
    val t0 = if (Views.debugRefresh) System.nanoTime() else 0L
    val vs = visiting + view
    val out = joinDefs.get(view) match {
      case Some(j) => refreshJoin(view, j, vs)
      case None =>
        val d = defs.getOrElse(view,
          throw new NoSuchElementException(s"undefined view: $view"))
        val src = sourceRef(view, d.source, vs)
        // the view's current catalog version is the previous result of
        // this exact transform — the hint that unlocks O(delta)
        // refresh-by-patch for uniqueKeys re-keys (secondary indexes)
        ops.transform(src, d.transform, d.fold, prev = catalog.get(view))
    }
    // don't mint a new catalog root for a no-op refresh (the git
    // equivalent of refusing an empty commit)
    if (!catalog.get(view).contains(out)) catalog.put(view, out)
    if (Views.debugRefresh)
      System.err.println(f"[refresh] $view ${(System.nanoTime() - t0) / 1e6}%.1f ms")
    out
  }

  private def sourceRef(view: String, source: String,
      visiting: Set[String]): TableRef =
    if (defs.contains(source) || joinDefs.contains(source))
      refresh(source, visiting)
    else catalog.get(source).getOrElse(
      throw new NoSuchElementException(s"view $view: missing source table $source"))

  private def refreshJoin(view: String, j: JoinDef,
      visiting: Set[String]): TableRef = {
    def src(name: String): TableRef = sourceRef(view, name, visiting)
    val (aRef, bRef) = (src(j.left), src(j.right))
    val (am, bm) = (ops.meta(aRef), ops.meta(bRef))
    require(am.keyCols == bm.keyCols,
      s"join view $view needs identical key columns: ${am.keyCols} vs ${bm.keyCols}")
    require(am.chunkTargetRows == bm.chunkTargetRows,
      s"join view $view needs equal chunk granularity")
    val keys = am.keyCols
    val aVals = am.schema.fields.toSeq.filterNot(f => keys.contains(f.name))
    val bVals = bm.schema.fields.toSeq.filterNot(f => keys.contains(f.name))
    val shared = aVals.map(_.name).toSet.intersect(bVals.map(_.name).toSet)
    require(shared.isEmpty,
      s"join view $view needs disjoint value columns, shared: $shared")
    if (j.presence) {
      val taken = (keys ++ (aVals ++ bVals).map(_.name)).toSet
      require(!taken(Views.PresentLeft) && !taken(Views.PresentRight),
        s"join view $view: column names ${Views.PresentLeft}/" +
          s"${Views.PresentRight} are reserved for presence markers")
    }
    // the alignment key IS the cache identity: fingerprint the joint
    // schema so a source schema change is a different operation
    val sig = Hashing.opHash(Seq("graft-join-schema-v1") ++ keys ++
      (aVals ++ bVals).map(f => f.name + ":" + f.dataType.json) ++
      (if (j.presence) Seq("presence") else Nil))
    // presence markers: the contributing side writes 1, the aligned-in
    // side NULL; FoldCoalesce (max) merges them, so after the join a
    // marker is non-NULL iff that side had the key — NULL-safe side
    // detection that value columns cannot provide
    def markers(leftSide: Boolean): Seq[org.apache.spark.sql.Column] =
      if (!j.presence) Nil
      else Seq(
        (if (leftSide) lit(1).cast("tinyint") else lit(null).cast("tinyint"))
          .as(Views.PresentLeft),
        (if (leftSide) lit(null).cast("tinyint") else lit(1).cast("tinyint"))
          .as(Views.PresentRight))
    // FUSED build: no widened copies are ever materialized — each side's
    // alignment into the joint schema is a read-time projection inside
    // the region-memoized aligned merge, so a first build is ONE
    // read+shuffle+write pass over the original chunk files and a delta
    // to either side recomputes only the touched key regions
    // (Ops.mergeAligned). Row content is identical to the former
    // widen-then-merge chain, so the resulting table hash is unchanged.
    val projA = keys.map(col) ++ aVals.map(f => col(f.name)) ++
      bVals.map(f => lit(null).cast(f.dataType).as(f.name)) ++
      markers(leftSide = true)
    val projB = keys.map(col) ++
      aVals.map(f => lit(null).cast(f.dataType).as(f.name)) ++
      bVals.map(f => col(f.name)) ++ markers(leftSide = false)
    val markerFields =
      if (!j.presence) Nil
      else Seq(
        org.apache.spark.sql.types.StructField(Views.PresentLeft,
          org.apache.spark.sql.types.ByteType),
        org.apache.spark.sql.types.StructField(Views.PresentRight,
          org.apache.spark.sql.types.ByteType))
    val outSchema = org.apache.spark.sql.types.StructType(
      keys.map(k => am.schema(k)) ++ aVals ++ bVals ++ markerFields)
    ops.mergeAligned(Seq(
      Ops.AlignedInput(aRef, s"graft-join-align-left-v1:$sig", projA),
      Ops.AlignedInput(bRef, s"graft-join-align-right-v1:$sig", projB)),
      outSchema, FoldSpec.FoldCoalesce)
  }

  /** Refresh every view in DEPENDENCY order (a view whose source is
    * itself a view refreshes after that source), so chained views — a
    * join view over a transform view, a rollup over a join — observe
    * their sources' CURRENT versions in one pass. Cycles are rejected. */
  def refreshAll(): Map[String, TableRef] = {
    val names = (defs.keys ++ joinDefs.keys).toSeq.sorted
    def deps(v: String): Seq[String] =
      (defs.get(v).map(d => Seq(d.source)) orElse
        joinDefs.get(v).map(j => Seq(j.left, j.right))).getOrElse(Nil)
        .filter(s => defs.contains(s) || joinDefs.contains(s))
    val order = scala.collection.mutable.LinkedHashSet.empty[String]
    val visiting = scala.collection.mutable.Set.empty[String]
    def visit(v: String): Unit =
      if (!order.contains(v)) {
        require(visiting.add(v), s"view dependency cycle at $v")
        deps(v).foreach(visit)
        visiting.remove(v)
        order += v
      }
    names.foreach(visit)
    order.toSeq.map(v => v -> refresh(v)).toMap
  }

  def definitions: Map[String, ViewDef] = defs.toMap
  def joinDefinitions: Map[String, JoinDef] = joinDefs.toMap
}

object Views {
  /** Profiling seam: per-view refresh walls to stderr. */
  private[graft] val debugRefresh: Boolean =
    sys.env.contains("GRAFT_DEBUG_REFRESH")

  final case class ViewDef(source: String, transform: ColTransform,
      fold: FoldSpec)

  /** Keyed full-outer join view over two catalog tables with IDENTICAL
    * key columns and disjoint value columns. `presence` appends per-side
    * marker columns ([[Views.PresentLeft]]/[[Views.PresentRight]]: 1
    * from the contributing side, NULL otherwise) so a downstream stage
    * can distinguish "side absent" from "side present with NULL values"
    * — the lowering substrate for INNER/LEFT join views. */
  final case class JoinDef(left: String, right: String,
      presence: Boolean = false)

  /** Presence-marker column names of a `presence = true` join view. */
  val PresentLeft = "__left_present"
  val PresentRight = "__right_present"
}
