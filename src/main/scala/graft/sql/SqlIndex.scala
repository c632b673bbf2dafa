package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import graft.core.{Catalog, ColTransform, FoldSpec, Hashing, Ops, TableRef, Views}

/** Secondary indexes as materialized views over the memoized algebra.
  *
  * An index on `t (c1, …, cn)` IS a table: `t` re-keyed by
  * `(c1, …, cn, pk…)` carrying no payload beyond its key — the classic
  * key-only secondary index, here expressed as a re-keying transform
  * (O2/sortTable) so every property of graft tables is inherited for
  * free: content-addressed, versioned with the root history,
  * replication/GC-visible, and maintained INCREMENTALLY — the rekey
  * rides the per-chunk-memoized O(delta) path (the fold is combinable
  * and the appended pk makes index keys unique, so partial folds are
  * trivially exact).
  *
  * Freshness is decided by the operation hash, not by bookkeeping: a
  * lookup first re-runs the defining transform against the source's
  * CURRENT version — unchanged source ⇒ whole-op memo hit (zero Spark
  * jobs), delta ⇒ only the touched chunks recompute. An index can
  * therefore never serve stale probes, the invariant that makes the
  * SELECT rewrite ([[GraftSql]]) safe.
  *
  * The definition persists in the catalog root like any materialized
  * view ([[Catalog.putViewDef]]) with the marker SQL
  * `INDEX ON t (c1, …)`; REFRESH ALL and cross-session rebuild pick it
  * up through the same path ([[SqlViews.fromCatalog]]).
  *
  * The reference has no secondary indexes — its tables are single-keyed
  * tries (/root/reference/messdb-base/src/MessDB/Table.hs:24-40); this
  * is the natural extension its own memoized-rekey machinery suggests.
  */
object SqlIndex {

  /** Marker "defining SQL" persisted in viewDefs for an index. */
  val defRe = """(?is)^\s*index\s+on\s+("?[\w.]+"?)\s*\(([^)]*)\)\s*$""".r

  private def unquote(s: String): String =
    s.trim.stripPrefix("\"").stripSuffix("\"")

  def isIndexDef(selectSql: String): Boolean =
    defRe.findFirstIn(selectSql.trim.stripSuffix(";")).isDefined

  /** Parse the marker → (source table, indexed columns). */
  def parse(selectSql: String): (String, Seq[String]) =
    selectSql.trim.stripSuffix(";") match {
      case defRe(t, cols) =>
        (unquote(t), cols.split(",").map(c => unquote(c)).toSeq.filter(_.nonEmpty))
      case other =>
        throw new GraftSql.SqlException(s"not an index definition: $other")
    }

  def marker(table: String, cols: Seq[String]): String =
    s"INDEX ON $table (${cols.mkString(", ")})"

  /** Declare the index into `views` as a re-keying transform view:
    * out keys = indexed cols ++ source pk (unique ⇒ any fold is a
    * no-op; FoldMin is combinable ⇒ O(delta) incremental maintenance),
    * payload = one constant byte so the rekey fold has a value column.
    */
  def declare(views: Views, catalog: Catalog, name: String,
      selectSql: String): Unit = {
    val (table, cols) = parse(selectSql)
    val entry = catalog.root.getOrElse(table,
      throw new GraftSql.SqlException(s"no such table: $table"))
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(entry.schemaJson).asInstanceOf[org.apache.spark.sql.types.StructType]
    val fields = schema.fieldNames.toSet
    cols.foreach(c => if (!fields.contains(c))
      throw new GraftSql.SqlException(s"no such column in $table: $c"))
    if (cols.isEmpty)
      throw new GraftSql.SqlException(s"index needs at least one column")
    val outKeys = (cols ++ entry.keyCols.filterNot(cols.contains)).distinct
    val sig = Hashing.sha256Hex(
      (name + " " + marker(table, cols)).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // NULL-keyed rows are excluded from the index: equality and range
    // probes never match NULL (SQL three-valued logic), and the key
    // encoder requires non-null keys — the standard partial-index-on-
    // NOT-NULL treatment. v2: the filter is part of the op identity.
    val nonNullKeys = cols.map(col(_).isNotNull).reduce(_ && _)
    views.declare(name, table,
      ColTransform(s"sqlidx-v2:$sig", outKeys,
        outKeys.map(col) :+ lit(1).cast("tinyint").as("_present"),
        filter = Some(nonNullKeys),
        // out keys embed the source pk ⇒ unique across the table: the
        // refresh after a delta patches the PREVIOUS index version
        // (O(delta) chunk writes) instead of re-merging every mini
        uniqueOutKeys = true),
      FoldSpec.FoldMin)
  }

  /** Indexes defined over `table`, as (index name → indexed columns),
    * deterministically ordered. */
  def indexesOn(catalog: Catalog, table: String): Seq[(String, Seq[String])] =
    catalog.viewDefs.toSeq.sortBy(_._1).collect {
      case (n, sql) if isIndexDef(sql) && parse(sql)._1 == table =>
        n -> parse(sql)._2
    }

  /** One bound of a range conjunct: literal value + inclusivity. */
  final case class RangeBound(value: Any, inclusive: Boolean)

  /** Index-driven read: refresh the index (memo decides — zero jobs
    * when the source is unchanged), scan it under the equality-prefix +
    * optional next-column range predicate — [[graft.core.GraftFileIndex]]
    * prunes index chunk FILES on leading-key predicates at planning
    * time, so the probe reads only the matching index range — pull the
    * matching primary keys to the driver, and read ONLY the table
    * chunks those keys can live in ([[Ops.lookupMany]]). Each prefix
    * position carries the column's candidate VALUES: one for an
    * equality, several for an IN-list (the per-value probes union in
    * this single scan). Above `maxKeys` matches the selectivity bet has
    * lost and the caller should scan instead — the bitmap-scan ↔
    * seq-scan flip every planner makes. Returns None on fallback. */
  def probe(spark: SparkSession, ops: Ops, catalog: Catalog,
      views: Views, table: String, index: String, idxCols: Seq[String],
      eqPrefix: Seq[Seq[Any]],
      range: Option[(Option[RangeBound], Option[RangeBound])] = None,
      maxKeys: Int = 100000): Option[DataFrame] = {
    views.refresh(index)
    val idxRef = catalog.get(index).getOrElse(return None)
    val entry = catalog.root(table)
    val pkCols = entry.keyCols
    val eqPred = idxCols.zip(eqPrefix).map { case (c, vs) =>
      if (vs.lengthCompare(1) == 0) col(c) === lit(vs.head)
      else col(c).isin(vs: _*)
    }
    val rangePred = range.toSeq.flatMap { case (lo, hi) =>
      val c = col(idxCols(eqPrefix.length))
      lo.map(b => if (b.inclusive) c >= lit(b.value) else c > lit(b.value)) ++
        hi.map(b => if (b.inclusive) c <= lit(b.value) else c < lit(b.value))
    }
    val preds = eqPred ++ rangePred
    if (preds.isEmpty) return None
    val pks = ops.scan(idxRef).where(preds.reduce(_ && _))
      .select(pkCols.map(col): _*)
      .limit(maxKeys + 1).collect()
    if (pks.length > maxKeys) return None
    val keys: Seq[Seq[Any]] = pks.toSeq.map(r => pkCols.indices.map(r.get))
    Some(ops.lookupMany(TableRef(entry.tableHash), keys))
  }
}
