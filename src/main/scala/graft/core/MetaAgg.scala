package graft.core

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.EvalMode
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Metadata-only aggregates: rewrite an UNFILTERED global
  * COUNT / MIN / MAX over a single graft scan into a [[LocalRelation]]
  * computed purely from the table's chunk metadata — zero chunk files
  * opened, zero Spark jobs.
  *
  * At 100 TB this turns `SELECT count(*) FROM t` from a
  * million-file footer crawl into a driver-side sum over the chunk
  * list the table meta already holds (the same list every scan's
  * planning loads anyway):
  *  - `count(*)` / `count(lit)`  = Σ chunk rows — always exact;
  *  - `count(col)`               = Σ rows − Σ nulls (zone-map null
  *    counts; key columns are non-null by construction);
  *  - `min(col)` / `max(col)`    = fold of the chunks' EXACT zone-map
  *    extremes (stats record real row values — oversized values drop
  *    the whole column's stats for the chunk, which makes this rule
  *    bail, never approximate);
  *  - `min/max(leading key)`     = decoded bound of the first/last
  *    chunk (the chunk list is key-ordered and key encodings are
  *    order-preserving and prefix-decodable).
  *
  * Conservative by construction: any Filter, grouping key, DISTINCT,
  * aggregate filter clause, unsupported function, missing stats, or
  * undecodable type leaves the plan untouched. Values are decoded
  * through the inverse of the SAME KeyCodec encoding the stats were
  * written in, and results replace the Aggregate's own output
  * attributes — downstream plans are unaffected.
  *
  * Registered per-session through `spark.experimental.extraOptimizations`
  * (idempotently, by [[Ops]]), the stock extension point for
  * library-provided optimizer rules — these run after Spark's own
  * batches, when the aggregate has its final shape and pushable filters
  * (which run at PHYSICAL planning for file sources) still sit above
  * the relation as logical Filters, so the no-filter check is sound.
  */
object MetaAgg extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate if agg.groupingExpressions.isEmpty =>
      graftScanOf(agg.child)
        .flatMap(meta => rewrite(agg, meta))
        .orElse(rangeCountRewrite(agg))
        .getOrElse(agg)
  }

  /** The TableMeta under `plan` iff it is NOTHING but column-pruning
    * Projects / aliases over one graft-scan relation — no Filter, no
    * join, no generator, nothing that changes the row multiset. */
  private def graftScanOf(plan: LogicalPlan): Option[TableMeta] = plan match {
    case Project(exprs, child) if exprs.forall {
      case _: AttributeReference => true
      case Alias(_: AttributeReference, _) => true
      case _ => false
    } => graftScanOf(child)
    case SubqueryAlias(_, child) => graftScanOf(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location match {
        case g: GraftFileIndex => Some(g.tableMeta)
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  /** Range COUNT from metadata: `count(*) … WHERE <leading-key range>`
    * counts every chunk PROVABLY CONTAINED in the range from its
    * metadata row count and scans only the (≤2, for a contiguous
    * range) edge chunks that straddle a bound — at 100 TB a
    * half-the-table range count reads two files instead of half a
    * million. The rewrite keeps the original Filter over a scan
    * relation REDUCED to the edge chunks and adds the interior total
    * to each count:
    *
    *   Aggregate[count(1) + INTERIOR](Filter(cond, scan(edges)))
    *
    * Sound because chunk key ranges are disjoint and sorted: a chunk
    * whose min AND max keys pass both bounds has EVERY key inside the
    * range ([[RangeBounds.chunkContained]] — the same arithmetic
    * rangeFilter splices with). Only fires when the WHOLE filter is
    * one leading-key range (≤1 lower + ≤1 upper comparison or one
    * equality, plus IsNotNull on key columns, which are non-null by
    * the table contract); any residual conjunct, non-count aggregate,
    * or empty interior leaves the plan untouched. */
  private def rangeCountRewrite(agg: Aggregate): Option[LogicalPlan] = {
    // unwrap column-pruning Projects/aliases around the Filter
    def stripToFilter(p: LogicalPlan): Option[(Expression, LogicalPlan)] =
      p match {
        case Project(exprs, child) if exprs.forall {
          case _: AttributeReference => true
          case _ => false
        } => stripToFilter(child)
        case SubqueryAlias(_, child) => stripToFilter(child)
        case Filter(cond, child) => Some((cond, child))
        case _ => None
      }
    def stripToRelation(p: LogicalPlan): Option[LogicalRelation] = p match {
      case Project(exprs, child) if exprs.forall {
        case _: AttributeReference => true
        case _ => false
      } => stripToRelation(child)
      case SubqueryAlias(_, child) => stripToRelation(child)
      case lr: LogicalRelation => Some(lr)
      case _ => None
    }
    for {
      (cond, below) <- stripToFilter(agg.child)
      lr <- stripToRelation(below)
      fs <- lr.relation match {
        case f: HadoopFsRelation => Some(f)
        case _ => None
      }
      g <- fs.location match {
        case g: GraftFileIndex => Some(g)
        case _ => None
      }
      m = g.tableMeta
      (lo, hi) <- leadingKeyRange(cond, m)
      // every output must be a count of non-null literals or of a key
      // column (keys are non-null, so both equal the row count)
      if agg.aggregateExpressions.forall {
        case Alias(AggregateExpression(f, Complete, false, None, _), _) =>
          f match {
            case Count(children) => children.forall {
              case l: Literal => l.value != null
              case a: AttributeReference => m.keyCols.contains(a.name)
              case _ => false
            }
            case _ => false
          }
        case _ => false
      }
      contained = m.chunks.filter(RangeBounds.chunkContained(_, lo, hi))
      if contained.nonEmpty // nothing to save otherwise
    } yield {
      val interior = contained.iterator.map(_.rows).sum
      val containedSet = contained.iterator.map(_.hash).toSet
      val edges = m.chunks.filter(c =>
        RangeBounds.chunkIntersects(c, lo, hi) && !containedSet(c.hash))
      if (edges.isEmpty) {
        LocalRelation(agg.output,
          Seq(InternalRow.fromSeq(agg.aggregateExpressions.map(_ => interior))))
      } else {
        val reduced = lr.copy(relation =
          fs.copy(location = g.withChunks(edges))(fs.sparkSession))
        val exprs = agg.aggregateExpressions.map {
          case a @ Alias(ae: AggregateExpression, name) =>
            Alias(Add(ae, Literal(interior)), name)(
              a.exprId, a.qualifier, a.explicitMetadata,
              a.nonInheritableMetadataKeys)
          case other => other // unreachable (guarded above)
        }
        agg.copy(aggregateExpressions = exprs,
          child = Filter(cond, reduced))
      }
    }
  }

  /** cond as EXACTLY one leading-key range: conjuncts are comparisons
    * of the LEADING key column with non-null literals — at most one
    * lower and one upper, or one equality — plus IsNotNull over key
    * columns (non-null by contract). Any other conjunct → None. */
  private def leadingKeyRange(cond: Expression, m: TableMeta)
      : Option[(Option[RangeBounds.Bnd], Option[RangeBounds.Bnd])] = {
    val lead = m.keyCols.head
    val dt = m.schema(lead).dataType
    def isLead(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == lead
      case _ => false
    }
    def enc(v: Any, inclusive: Boolean): Option[RangeBounds.Bnd] =
      try {
        val ext = org.apache.spark.sql.catalyst.CatalystTypeConverters
          .createToScalaConverter(dt)(v)
        if (ext == null) None
        else {
          val buf = new KeyCodec.ByteBuf(24)
          KeyCodec.fieldEncoder(dt)(buf, ext)
          Some((buf.toBytes, inclusive))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    var lo: Option[RangeBounds.Bnd] = None
    var hi: Option[RangeBounds.Bnd] = None
    def setLo(b: Option[RangeBounds.Bnd]): Boolean =
      b.isDefined && lo.isEmpty && { lo = b; true }
    def setHi(b: Option[RangeBounds.Bnd]): Boolean =
      b.isDefined && hi.isEmpty && { hi = b; true }
    val conjuncts = {
      def split(e: Expression): Seq[Expression] = e match {
        case And(l, r) => split(l) ++ split(r)
        case x => Seq(x)
      }
      split(cond)
    }
    val allUsed = conjuncts.forall {
      case IsNotNull(a: AttributeReference) if m.keyCols.contains(a.name) =>
        true // keys are non-null by the table contract
      case EqualTo(a, Literal(v, _)) if isLead(a) =>
        setLo(enc(v, inclusive = true)) && setHi(enc(v, inclusive = true))
      case EqualTo(Literal(v, _), a) if isLead(a) =>
        setLo(enc(v, inclusive = true)) && setHi(enc(v, inclusive = true))
      case GreaterThanOrEqual(a, Literal(v, _)) if isLead(a) =>
        setLo(enc(v, inclusive = true))
      case GreaterThan(a, Literal(v, _)) if isLead(a) =>
        setLo(enc(v, inclusive = false))
      case LessThanOrEqual(a, Literal(v, _)) if isLead(a) =>
        setHi(enc(v, inclusive = true))
      case LessThan(a, Literal(v, _)) if isLead(a) =>
        setHi(enc(v, inclusive = false))
      case GreaterThanOrEqual(Literal(v, _), a) if isLead(a) =>
        setHi(enc(v, inclusive = true))
      case GreaterThan(Literal(v, _), a) if isLead(a) =>
        setHi(enc(v, inclusive = false))
      case LessThanOrEqual(Literal(v, _), a) if isLead(a) =>
        setLo(enc(v, inclusive = true))
      case LessThan(Literal(v, _), a) if isLead(a) =>
        setLo(enc(v, inclusive = false))
      case _ => false
    }
    if (allUsed && (lo.isDefined || hi.isDefined)) Some((lo, hi)) else None
  }

  private def rewrite(agg: Aggregate, m: TableMeta): Option[LogicalPlan] = {
    val totalRows = m.chunks.iterator.map(_.rows).sum
    val values = agg.aggregateExpressions.map {
      case Alias(ae: AggregateExpression, _) => aggValue(ae, m, totalRows)
      case ae: AggregateExpression => aggValue(ae, m, totalRows)
      case _ => None
    }
    if (values.exists(_.isEmpty)) return None
    Some(LocalRelation(agg.output,
      Seq(InternalRow.fromSeq(values.map(_.get.orNull)))))
  }

  /** Some(Some(v)) = answered with value v; Some(None) = answered with
    * SQL NULL; None = cannot answer from metadata. */
  private def aggValue(ae: AggregateExpression, m: TableMeta,
      totalRows: Long): Option[Option[Any]] = {
    if (ae.isDistinct || ae.filter.isDefined || ae.mode != Complete)
      return None
    def colName(e: Expression): Option[String] = e match {
      case a: AttributeReference if m.schema.fieldNames.contains(a.name) =>
        Some(a.name)
      case _ => None
    }
    // per-chunk stats usable iff recorded and not the dropped sentinel
    def statsOf(name: String): Option[Seq[ColStats]] = {
      val ss = m.chunks.map(_.stats.get(name))
      if (ss.forall(s => s.isDefined && s.get.nulls >= 0)) Some(ss.map(_.get))
      else None
    }
    def decode(name: String, hex: String): Option[Any] = {
      val dec = KeyCodec.fieldDecoder(m.schema(name).dataType)
      dec.flatMap { d =>
        try Option(d(Hashing.unhex(hex), 0)._1)
        catch { case scala.util.control.NonFatal(_) => None }
      }
    }
    def extreme(name: String, isMin: Boolean): Option[Option[Any]] =
      if (m.keyCols.headOption.contains(name)) {
        // leading key: the chunk list is key-ordered, so the global
        // extreme is the first chunk's minKey / last chunk's maxKey
        if (m.chunks.isEmpty) Some(None)
        else decode(name,
          if (isMin) m.chunks.head.minKeyHex else m.chunks.last.maxKeyHex)
          .map(Some(_))
      } else if (m.keyCols.contains(name)) None // non-leading key: untracked
      else statsOf(name).flatMap { ss =>
        val hexes = ss.flatMap(s => if (isMin) s.minHex else s.maxHex)
        if (hexes.isEmpty) {
          // no non-null value anywhere ⇒ the aggregate is NULL — but
          // only when the null counts PROVE every row was null (a chunk
          // with rows, no extreme, and too few nulls would mean broken
          // stats: refuse to answer)
          if (ss.map(_.nulls).sum == totalRows) Some(None) else None
        } else {
          val best = hexes.map(Hashing.unhex).reduce { (a, b) =>
            val c = Hashing.compareBytes(a, b)
            if ((c <= 0) == isMin) a else b
          }
          decode(name, Hashing.hex(best)).map(Some(_))
        }
      }
    ae.aggregateFunction match {
      case Count(children) if children.forall {
        case l: Literal => l.value != null
        case _ => false
      } => Some(Some(totalRows))
      case Count(Seq(e)) => colName(e).flatMap { name =>
        if (m.keyCols.contains(name)) Some(Some(totalRows)) // keys non-null
        else statsOf(name).map(ss => Some(totalRows - ss.map(_.nulls).sum))
      }
      case Min(e) => colName(e).flatMap(extreme(_, isMin = true))
      case Max(e) => colName(e).flatMap(extreme(_, isMin = false))
      case s: Sum =>
        // exact per-chunk sums (ColStats.sumDec, BigInteger — no
        // overflow at any chunk size). Mode semantics:
        //  - total IN RANGE of the result type: the exact value is the
        //    answer under EVERY eval mode (LEGACY, ANSI, TRY agree
        //    when nothing overflows);
        //  - integral total OUT of Long range: LEGACY wraps — the
        //    BigInteger total's low 64 bits ARE the wrapped sum
        //    (wrapping addition is associative/commutative); ANSI must
        //    raise and TRY must null, so both bail to the real scan;
        //  - decimal total beyond the widened precision: bail (ANSI
        //    raises, LEGACY/TRY null — let the scan decide);
        //  - fp input never records sums (order-dependent addition).
        colName(s.child).flatMap { name =>
          if (m.keyCols.contains(name)) None
          else statsOf(name).flatMap { ss =>
            val sums = ss.flatMap(_.sumDec)
            if (sums.length != ss.length) None // a chunk without sums
            else if (ss.map(_.nulls).sum == totalRows) Some(None) // all NULL
            else {
              val total = sums.map(new java.math.BigInteger(_))
                .foldLeft(java.math.BigInteger.ZERO)(_ add _)
              val legacy = s.evalContext.evalMode == EvalMode.LEGACY
              ae.dataType match {
                case LongType =>
                  val fits = total.bitLength() <= 63
                  if (fits || legacy) Some(Some(total.longValue()))
                  else None
                case d: DecimalType =>
                  val dec = new java.math.BigDecimal(total, d.scale)
                  if (dec.precision > d.precision) None
                  else Some(Some(org.apache.spark.sql.types.Decimal(
                    dec, d.precision, d.scale)))
                case _ => None
              }
            }
          }
        }
      case a: Average =>
        // avg(integral): Spark accumulates the sum in DOUBLE
        // (Average.sumDataType = DoubleType for integral children), so
        // a partial-sum order can round — the exact BigInteger total
        // only matches the scan when EVERY intermediate double sum is
        // exact in any accumulation order. Provable from metadata when
        // the column is single-signed (zone-map extremes) and |total|
        // ≤ 2^53: all prefix sums then lie between 0 and total, each
        // exactly representable. Anything else — mixed signs, large
        // totals, all modes alike — bails to the real scan. All-null ⇒
        // NULL. Decimal averages bail (division/rounding semantics
        // belong to execution); fp sums are never recorded.
        colName(a.child).flatMap { name =>
          if (m.keyCols.contains(name)) None
          else statsOf(name).flatMap { ss =>
            val nonNull = totalRows - ss.map(_.nulls).sum
            if (nonNull == 0) Some(None)
            else {
              val sums = ss.flatMap(_.sumDec)
              if (sums.length != ss.length) None // a chunk without sums
              else {
                val total = sums.map(new java.math.BigInteger(_))
                  .foldLeft(java.math.BigInteger.ZERO)(_ add _)
                def signOf(isMin: Boolean): Option[Int] =
                  extreme(name, isMin).flatMap {
                    case Some(v: Number) =>
                      Some(java.lang.Long.signum(v.longValue()))
                    case _ => None
                  }
                val singleSigned =
                  signOf(isMin = true).exists(_ >= 0) ||
                    signOf(isMin = false).exists(_ <= 0)
                ae.dataType match {
                  case org.apache.spark.sql.types.DoubleType
                      if singleSigned && total.abs.bitLength() <= 53 =>
                    Some(Some(total.doubleValue() / nonNull))
                  case _ => None
                }
              }
            }
          }
        }
      case _ => None
    }
  }
}
