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

  final case class ViewDef(source: String, transform: ColTransform,
      fold: FoldSpec)

  private val defs =
    scala.collection.concurrent.TrieMap.empty[String, ViewDef]

  /** Register a view and materialize its first version. */
  def define(view: String, source: String, transform: ColTransform,
      fold: FoldSpec = FoldSpec.FoldLast): TableRef = {
    defs.put(view, ViewDef(source, transform, fold))
    refresh(view)
  }

  /** Re-materialize from the source's current catalog version. Cost is
    * zero (memo hit) when the source hash is unchanged, O(touched
    * chunks) after a delta for key-preserving transforms. */
  def refresh(view: String): TableRef = {
    val d = defs.getOrElse(view,
      throw new NoSuchElementException(s"undefined view: $view"))
    val src = catalog.get(d.source).getOrElse(
      throw new NoSuchElementException(s"view $view: missing source table ${d.source}"))
    val out = ops.transform(src, d.transform, d.fold)
    // don't mint a new catalog root for a no-op refresh (the git
    // equivalent of refusing an empty commit)
    if (!catalog.get(view).contains(out)) catalog.put(view, out)
    out
  }

  def refreshAll(): Map[String, TableRef] =
    defs.keys.toSeq.sorted.map(v => v -> refresh(v)).toMap

  def definitions: Map[String, ViewDef] = defs.toMap
}
