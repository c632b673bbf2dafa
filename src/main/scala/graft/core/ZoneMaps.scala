package graft.core

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.StructType

/** Zone-map reasoning over chunk metadata: decide from a chunk's
  * per-column (min, max, nulls) statistics whether a predicate can
  * possibly match any of its rows. One evaluator serves every consumer —
  * scan-time file pruning ([[GraftFileIndex]]) and transform/DML chunk
  * skipping ([[Ops]]) — so the arithmetic cannot diverge between paths.
  *
  * Comparisons use the same order-preserving [[KeyCodec]] encoding the
  * stats are stored in, so everything is one unsigned byte compare.
  * Conservative by construction: a chunk without stats for a column
  * always survives, unrecognized predicate shapes return None (no
  * claim), and null semantics are exact — a comparison or IN never
  * matches a null, so an all-null chunk prunes under them; IS NULL keeps
  * only chunks recording nulls. AND/OR/NOT recurse: AND may prune when
  * either side proves empty (missing sides are conservatively true), OR
  * only when BOTH sides are understood and prove empty.
  */
object ZoneMaps {

  /** keep-chunk test for one predicate: Some(test) when the shape is
    * understood; test(c) == false PROVES no row of chunk c satisfies the
    * predicate (rows where it evaluates to null count as not
    * satisfying — the SQL filter/DML semantics). None = no claim. */
  def keepTest(schema: StructType, e: Expression): Option[ChunkMeta => Boolean] = {
    def encodeLit(name: String, v: Any): Option[Array[Byte]] =
      try {
        val dt = schema(name).dataType
        val ext = CatalystTypeConverters.createToScalaConverter(dt)(v)
        if (ext == null) None
        else {
          val buf = new KeyCodec.ByteBuf(24)
          KeyCodec.fieldEncoder(dt)(buf, ext)
          Some(buf.toBytes)
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    def at(x: Expression): Option[String] = x match {
      case a: AttributeReference if schema.fieldNames.contains(a.name) =>
        Some(a.name)
      case _ => None
    }
    def cmp(s: ColStats, side: ColStats => Option[String], b: Array[Byte])
        : Option[Int] =
      side(s).map(h => Hashing.compareBytes(Hashing.unhex(h), b))
    // keep-chunk test for (column, op, encoded literal)
    def keep(name: String, op: String, b: Array[Byte])(c: ChunkMeta): Boolean =
      c.stats.get(name) match {
        case None => true // no stats recorded — cannot prune
        case Some(s) => op match {
          // equality: the chunk DICTIONARY answers exactly when present
          // (categorical columns, where the [min,max] envelope spans the
          // whole alphabet in every chunk and never excludes anything);
          // otherwise the envelope. All-null chunk (min/max None, empty
          // dict): no comparison can match.
          case "=" => s.dictHex match {
            case Some(ds) => ds.contains(Hashing.hex(b))
            case None => cmp(s, _.minHex, b).exists(_ <= 0) &&
              cmp(s, _.maxHex, b).exists(_ >= 0)
          }
          case ">=" => cmp(s, _.maxHex, b).exists(_ >= 0)
          case ">" => cmp(s, _.maxHex, b).exists(_ > 0)
          case "<=" => cmp(s, _.minHex, b).exists(_ <= 0)
          case "<" => cmp(s, _.minHex, b).exists(_ < 0)
          // a <> v matches unless every non-null value IS v
          case "<>" => (cmp(s, _.minHex, b), cmp(s, _.maxHex, b)) match {
            case (Some(x), Some(y)) => !(x == 0 && y == 0)
            case _ => false // all-null: <> never true
          }
          case _ => true
        }
      }
    def one(x: Expression, op: String, v: Any): Option[ChunkMeta => Boolean] =
      at(x).flatMap(n => encodeLit(n, v).map(b => keep(n, op, b) _))
    def inList(x: Expression, vs: Seq[Any], complete: Boolean)
        : Option[ChunkMeta => Boolean] =
      at(x).flatMap { n =>
        val encoded = vs.filter(_ != null).flatMap(v => encodeLit(n, v))
        if (!complete || encoded.isEmpty ||
            encoded.length != vs.count(_ != null)) None
        else {
          val lo = encoded.minBy(identity)(Ordering.fromLessThan(
            (a: Array[Byte], b: Array[Byte]) => Hashing.compareBytes(a, b) < 0))
          val hi = encoded.maxBy(identity)(Ordering.fromLessThan(
            (a: Array[Byte], b: Array[Byte]) => Hashing.compareBytes(a, b) < 0))
          val hexes = encoded.map(Hashing.hex).toSet
          Some((c: ChunkMeta) => c.stats.get(n) match {
            case Some(s) if s.dictHex.isDefined =>
              // exact: some listed value must BE in the chunk dictionary
              s.dictHex.get.exists(hexes)
            case _ =>
              // the list's [lo, hi] envelope must intersect the chunk's
              keep(n, ">=", lo)(c) && keep(n, "<=", hi)(c)
          })
        }
      }
    e match {
      case And(l, r) =>
        // either side proving empty proves the conjunction empty; a side
        // we don't understand contributes "always keep"
        (keepTest(schema, l), keepTest(schema, r)) match {
          case (None, None) => None
          case (a, b) =>
            Some(c => a.forall(_(c)) && b.forall(_(c)))
        }
      case Or(l, r) =>
        // pruning a disjunction needs BOTH sides understood
        for (a <- keepTest(schema, l); b <- keepTest(schema, r))
          yield (c: ChunkMeta) => a(c) || b(c)
      case EqualTo(a, LitV(v)) => one(a, "=", v)
      case EqualTo(LitV(v), a) => one(a, "=", v)
      case Not(EqualTo(a, LitV(v))) => one(a, "<>", v)
      case Not(EqualTo(LitV(v), a)) => one(a, "<>", v)
      case GreaterThanOrEqual(a, LitV(v)) => one(a, ">=", v)
      case GreaterThan(a, LitV(v)) => one(a, ">", v)
      case LessThanOrEqual(a, LitV(v)) => one(a, "<=", v)
      case LessThan(a, LitV(v)) => one(a, "<", v)
      // literal-first forms flip the comparison direction
      case GreaterThanOrEqual(LitV(v), a) => one(a, "<=", v)
      case GreaterThan(LitV(v), a) => one(a, "<", v)
      case LessThanOrEqual(LitV(v), a) => one(a, ">=", v)
      case LessThan(LitV(v), a) => one(a, ">", v)
      case In(a, list) =>
        val lits = list.flatMap(LitV.unapply)
        inList(a, lits, complete = lits.length == list.length)
      case InSet(a, hset) => inList(a, hset.toSeq, complete = true)
      case IsNull(a) => at(a).map(n => (c: ChunkMeta) =>
        c.stats.get(n).forall(_.nulls > 0))
      case IsNotNull(a) => at(a).map(n => (c: ChunkMeta) =>
        c.stats.get(n).forall(_.minHex.nonEmpty))
      case _ => None
    }
  }

  /** Foldable-operand extractor: literals, plus coercion casts and other
    * constant expressions an ANALYZED (unoptimized) predicate carries. */
  private object LitV {
    def unapply(x: Expression): Option[Any] = x match {
      case Literal(v, _) => Some(v)
      case f if f.foldable && f.deterministic =>
        try Some(f.eval(EmptyRow)) catch { case scala.util.control.NonFatal(_) => None }
      case _ => None
    }
  }

  /** All understood keep-tests among top-level conjuncts. */
  def keepTests(schema: StructType, filters: Seq[Expression])
      : Seq[ChunkMeta => Boolean] =
    filters.flatMap(keepTest(schema, _))

  /** Some(test) where test(c) == true PROVES no row of chunk c satisfies
    * the predicate; None when the shape contributes no claim (callers
    * must then treat every chunk as potentially matching). */
  def provablyNoMatch(schema: StructType, pred: Expression)
      : Option[ChunkMeta => Boolean] =
    keepTest(schema, pred).map(t => (c: ChunkMeta) => !t(c))
}
