package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Named fold: combines colliding values per key. The NAME is the cache
  * identity, exactly like the reference's FuncKey discipline
  * (/root/reference/messdb-base/src/MessDB/Trie.hs:513-521,
  * /root/reference/messdb-schema/src/MessDB/Table.hs:62-78): operation
  * hashes include `key`, so changing a fold's behavior requires a new key.
  *
  * `agg(valueCol)` must produce aggregate expressions evaluated per key
  * group; `_graft_src` (the input-table index, 0-based left-to-right)
  * carries the reference's explicit left-to-right fold order
  * (Trie.hs:396-401) through the shuffle.
  */
trait FoldSpec extends Serializable {
  def key: String
  /** One aggregate Column per value column (aliased to the column name). */
  def aggs(valueCols: Seq[String]): Seq[Column]
  /** True iff fold(v, v) == v — merging a table with itself is the
    * identity. The reference only establishes this for fold_to_last
    * (TrieSpec.hs:31-38); sum-like folds double values and must take the
    * general path. Gates the self-merge fast path in Ops.merge. */
  def idempotent: Boolean = false
  /** True when the fold is commutative, associative, AND folding partial
    * fold results equals folding the raw values (sum of sums == sum, min
    * of mins == min). Unlocks the O(delta) re-keying transform path
    * (per-chunk pre-fold + region-memoized merge) and source-order-free
    * region memo keys. fold_to_last is NOT combinable: its result depends
    * on the source index ordering. */
  def combinable: Boolean = false
  /** Combinable AND bit-reproducible over these value column types —
    * content-address convergence (incremental == from-scratch hash)
    * needs partial folds to be bit-identical, not just mathematically
    * equal. FP addition is non-associative, so FoldSum restricts its
    * incremental path to exact types (integral/decimal); min/max pick
    * an input value unchanged and stay combinable for every type. */
  def combinableFor(valueTypes: Seq[org.apache.spark.sql.types.DataType]): Boolean =
    combinable

  /** Name-carrying variant — per-column folds match members by NAME, so
    * a re-key that reorders columns can never judge a member against the
    * wrong column's type. Default delegates to the positional check. */
  def combinableForNamed(
      valueCols: Seq[(String, org.apache.spark.sql.types.DataType)]): Boolean =
    combinableFor(valueCols.map(_._2))

  /** Retraction contract (delete-aware O(delta) view maintenance): the
    * per-row projection that INVERTS a contribution in value column
    * `name`, or None when this fold cannot retract. The contract is
    * `fold(xs ++ invert(ys)) == fold(xs ∖ ys)` BIT-exactly whenever
    * `ys ⊆ xs` as a multiset, for every type [[combinableFor]] admits
    * — SUM/COUNT negate (exact integer/decimal arithmetic, already the
    * combinable gate), histogram sketches negate their bin counts;
    * MIN/MAX/KMV are NOT invertible (a retraction can require values
    * the partial fold discarded) and return None, as does any fold
    * whose author has not established the contract. NULL semantics are
    * the CALLER's burden: folds that skip NULLs (sum) revert to NULL —
    * not 0 — when the last non-null contribution is retracted, which
    * inversion cannot express; the retraction route therefore admits
    * only provably non-null contribution columns. */
  def invertContrib(name: String): Option[Column] = None

  /** Linearity contract (multiplicity-aware retraction): the per-row
    * projection equal to folding `n` IDENTICAL copies of the
    * contribution in value column `name` — `fold(replicate(n, x)) ==
    * scale(x, n)` BIT-exactly for every n ≥ 1 over the types
    * [[combinableFor]] admits. Only LINEAR folds qualify: SUM/COUNT
    * multiply (exact integer/decimal arithmetic — n repeated additions
    * and one multiplication agree bit-wise, wrap-around included),
    * histogram sketches multiply their bin counts. This is what lets
    * the distributed retraction fold a net delta row carrying
    * multiplicity M as ONE scaled row instead of expanding M rows —
    * for a count-shaped view (every contribution in a group is the
    * identical (g, 1) row) a retention purge of M rows nets to a
    * single row with multiplicity M, so without this contract the
    * expansion is O(deleted rows) in ONE task at exactly the scale the
    * distributed route exists for. None = not linear; the route falls
    * back to a capped expansion. `n` is strictly positive where the
    * engine evaluates this (deletions invert first, then scale by
    * |net|). */
  def scaleContrib(name: String, n: Column): Option[Column] = None
}

object FoldSpec {
  val SRC = "_graft_src"

  /** Default last-writer-wins (`fold_to_last`, Trie.hs:523-529): the value
    * from the highest source index wins. */
  case object FoldLast extends FoldSpec {
    val key = "fold_to_last"
    def aggs(valueCols: Seq[String]): Seq[Column] =
      valueCols.map(c => max_by(col(c), col(SRC)).as(c))
    override val idempotent = true
  }

  /** Commutative numeric sum fold. */
  case object FoldSum extends FoldSpec {
    val key = "fold_sum"
    def aggs(valueCols: Seq[String]): Seq[Column] =
      valueCols.map(c => sum(col(c)).as(c))
    override val combinable = true
    override def combinableFor(
        valueTypes: Seq[org.apache.spark.sql.types.DataType]): Boolean = {
      import org.apache.spark.sql.types._
      valueTypes.forall {
        case ByteType | ShortType | IntegerType | LongType => true
        case _: DecimalType => true
        case _ => false
      }
    }
    // negation is exact for the integral/decimal types combinableFor
    // admits (wrap-around stays associative mod 2^w), so sums retract
    override def invertContrib(name: String): Option[Column] =
      Some((-col(name)).as(name))
    // SUM is linear: n identical contributions fold to x·n — exact for
    // the admitted integer types (n repeated additions mod 2^w equal
    // one multiplication mod 2^w) and for decimals (same value, the
    // caller casts back to the result type)
    override def scaleContrib(name: String, n: Column): Option[Column] =
      Some((col(name) * n).as(name))
  }

  case object FoldMin extends FoldSpec {
    val key = "fold_min"
    def aggs(valueCols: Seq[String]): Seq[Column] =
      valueCols.map(c => min(col(c)).as(c))
    override val idempotent = true
    override val combinable = true
  }

  case object FoldMax extends FoldSpec {
    val key = "fold_max"
    def aggs(valueCols: Seq[String]): Seq[Column] =
      valueCols.map(c => max(col(c)).as(c))
    override val idempotent = true
    override val combinable = true
  }

  private[core] def exactValueTypes(
      ts: Seq[org.apache.spark.sql.types.DataType]): Boolean = {
    import org.apache.spark.sql.types._
    ts.forall {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case BooleanType | StringType | BinaryType => true // no arithmetic
      case _ => false
    }
  }

  /** User-declared commutative-associative fold over one aggregate
    * expression per value column — a named monoid. Declaring it
    * combinable is the caller's FuncKey-style contract: the aggregate
    * must satisfy fold(fold(xs) ++ fold(ys)) == fold(xs ++ ys)
    * BIT-exactly, which unlocks the O(delta) incremental re-key path and
    * src-free region memo keys. `exactTypesOnly` adds FoldSum's guard
    * (fall back to whole-table for FP value columns); set it for any
    * arithmetic fold. */
  final case class CombinableFold(key: String, agg: Column => Column,
      override val idempotent: Boolean = false,
      exactTypesOnly: Boolean = false,
      invert: Option[Column => Column] = None,
      scale: Option[(Column, Column) => Column] = None) extends FoldSpec {
    def aggs(valueCols: Seq[String]): Seq[Column] =
      valueCols.map(c => agg(col(c)).as(c))
    override val combinable = true
    override def combinableFor(
        valueTypes: Seq[org.apache.spark.sql.types.DataType]): Boolean =
      !exactTypesOnly || exactValueTypes(valueTypes)
    // the author-declared retraction (FoldSpec.invertContrib contract);
    // idempotent monoids (bit_or, coalesce/max) have no inverse and
    // leave it None
    override def invertContrib(name: String): Option[Column] =
      invert.map(f => f(col(name)).as(name))
    // author-declared linearity (FoldSpec.scaleContrib contract):
    // fold(n copies of x) == scale(x, n) bit-exactly
    override def scaleContrib(name: String, n: Column): Option[Column] =
      scale.map(f => f(col(name), n).as(name))
  }

  /** Example monoids: bitwise accumulation — idempotent (x|x == x,
    * x&x == x) AND combinable, so they ride every fast path. (A product
    * fold would NOT qualify: Spark's `product` aggregates in double,
    * which is neither type-preserving nor associative bit-wise.) */
  val FoldBitOr: CombinableFold =
    CombinableFold("fold_bit_or_v1", c => bit_or(c), idempotent = true)
  val FoldBitAnd: CombinableFold =
    CombinableFold("fold_bit_and_v1", c => bit_and(c), idempotent = true)

  /** Keyed-join combiner: per-column `max` IGNORING NULLS. When at most
    * one source contributes a non-null per (key, column) — the join-view
    * widening guarantees it (each side nulls the other side's columns,
    * and keys are unique within a table) — max IS coalesce, and it is
    * commutative/associative/idempotent bit-exactly (it picks an input
    * value unchanged), so join views ride every incremental fast path. */
  val FoldCoalesce: CombinableFold =
    CombinableFold("fold_coalesce_v1", c => max(c), idempotent = true)

  /** Per-column composite fold: each value column folds under its own
    * member spec — `SUM(a), MIN(b), MAX(c)` in one operation. The key
    * encodes every (column, member-key) pair, so the composite obeys the
    * FuncKey discipline member-wise. Fast-path qualification is the
    * CONJUNCTION of the members': combinable/idempotent iff every member
    * is, and `combinableForNamed` judges each member against ITS column's
    * type by NAME (the nameless positional entry point stays
    * conservative: every member must accept every type). Every value
    * column present at fold time must have a member. */
  final case class FoldByColumn(members: Seq[(String, FoldSpec)]) extends FoldSpec {
    private val byName = members.toMap
    val key: String = "fold_by_col_v1:" +
      members.map { case (c, f) => s"$c=${f.key}" }.mkString(",")
    def aggs(valueCols: Seq[String]): Seq[Column] =
      valueCols.map { c =>
        byName.getOrElse(c, throw new NoSuchElementException(
          s"fold_by_col: no member fold for value column $c")).aggs(Seq(c)).head
      }
    override val idempotent: Boolean = members.forall(_._2.idempotent)
    override val combinable: Boolean = members.forall(_._2.combinable)
    override def combinableFor(
        valueTypes: Seq[org.apache.spark.sql.types.DataType]): Boolean =
      // positional entry point has no names to match on — conservative:
      // every member must accept every type (an exact-types-only member
      // like FoldSum gates ALL columns; never wrong, possibly slow)
      combinable && members.forall(_._2.combinableFor(valueTypes))
    override def combinableForNamed(
        valueCols: Seq[(String, org.apache.spark.sql.types.DataType)]): Boolean =
      // judge each member against ITS column's type BY NAME — immune to
      // column reordering between the projection list and the output
      // schema; an unknown column (no member) is conservatively not
      // combinable
      combinable && valueCols.forall { case (n, t) =>
        byName.get(n).exists(_.combinableFor(Seq(t)))
      }
    // member-wise: a column retracts iff ITS member does (the caller
    // requires every value column to, so one MIN member vetoes the route)
    override def invertContrib(name: String): Option[Column] =
      byName.get(name).flatMap(_.invertContrib(name))
    // member-wise linearity, like inversion
    override def scaleContrib(name: String, n: Column): Option[Column] =
      byName.get(name).flatMap(_.scaleContrib(name, n))
  }

  /** General NON-commutative pairwise fold in source order — the full
    * FoldFunc semantics (`V.foldl1 (fold key)` over colliding values in
    * input order, Trie.hs:396-401): collect (src, value) pairs, sort by
    * source index, reduce left-to-right with an arbitrary binary Column
    * function. Costs a collect_list per key — use the aggregate-style
    * folds above when the function is commutative. */
  final case class FoldPairwise(key: String,
      reduce: (Column, Column) => Column) extends FoldSpec {
    def aggs(valueCols: Seq[String]): Seq[Column] =
      valueCols.map { c =>
        val pairs = sort_array(collect_list(struct(col(SRC).as("s"), col(c).as("v"))))
        val vs = transform(pairs, p => p.getField("v"))
        // tail = slice(vs, 2, size-1); slice's length must not overflow
        aggregate(slice(vs, lit(2), greatest(size(vs) - 1, lit(0))),
          element_at(vs, 1), (acc, x) => reduce(acc, x)).as(c)
      }
  }

  /** Example non-commutative fold: ordered string concatenation. */
  val FoldConcat: FoldPairwise =
    FoldPairwise("fold_concat_v1", (a, b) => concat(a, lit("|"), b))
}

/** Named row transform: (k,v) → (k',v') over the whole table, possibly
  * re-keying — the reference's TransformFunc (Trie.hs:520, total, 1→1;
  * our Spark variant may also drop/expand rows since `select`/`where`
  * naturally allow it). Output key collisions are folded by the
  * accompanying FoldSpec, mirroring sortTrie (Trie.hs:433-470). */
trait TransformSpec extends Serializable {
  def key: String
  def outKeyCols: Seq[String]
  def apply(df: DataFrame): DataFrame
}

object TransformSpec {
  def apply(k: String, keyCols: Seq[String])(f: DataFrame => DataFrame): TransformSpec =
    new TransformSpec {
      val key = k
      val outKeyCols = keyCols
      def apply(df: DataFrame): DataFrame = f(df)
    }
}

/** String-keyed registries so operations can be replayed from names —
  * the engine-side FuncKey table. */
final class FuncRegistry {
  private val folds = scala.collection.concurrent.TrieMap[String, FoldSpec](
    FoldSpec.FoldLast.key -> FoldSpec.FoldLast,
    FoldSpec.FoldSum.key -> FoldSpec.FoldSum,
    FoldSpec.FoldMin.key -> FoldSpec.FoldMin,
    FoldSpec.FoldMax.key -> FoldSpec.FoldMax,
    FoldSpec.FoldCoalesce.key -> FoldSpec.FoldCoalesce)
  private val transforms = scala.collection.concurrent.TrieMap[String, TransformSpec]()

  def registerFold(f: FoldSpec): Unit = { folds.put(f.key, f); () }
  def registerTransform(t: TransformSpec): Unit = { transforms.put(t.key, t); () }
  def fold(key: String): FoldSpec = folds.getOrElse(key,
    throw new NoSuchElementException(s"unregistered fold: $key"))
  def transform(key: String): TransformSpec = transforms.getOrElse(key,
    throw new NoSuchElementException(s"unregistered transform: $key"))
}
