package graft.core

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Order-preserving binary encodings for key columns, plus deterministic
  * (not necessarily order-preserving) encodings for value columns.
  *
  * The reference requires that key serialization "retain the same order as
  * original values" when compared bytewise
  * (/root/reference/messdb-schema/src/MessDB/Table/Types.hs:34-44): signed
  * ints are big-endian with the sign bit flipped, floats are IEEE bits with
  * sign-flip / full complement for negatives, byte strings use an escaped
  * encoding whose terminator sorts below any content. We re-derive the same
  * properties with independent, simpler encodings — the property that
  * matters (compare(a,b) == compare(enc(a),enc(b))) is tested, not the
  * byte layout.
  *
  * These encodings exist ONLY for canonical content hashing and
  * deterministic chunk boundaries; Catalyst compares natively everywhere
  * else (SURVEY.md §1.6).
  */
object KeyCodec {

  // ---- primitive order-preserving encoders ----------------------------

  /** Signed long → 8 bytes big-endian with sign bit flipped. */
  def encodeLong(buf: ByteBuf, v: Long): Unit = {
    val x = v ^ Long.MinValue
    var i = 56
    while (i >= 0) { buf += ((x >>> i) & 0xff).toByte; i -= 8 }
  }

  def encodeInt(buf: ByteBuf, v: Int): Unit = {
    val x = v ^ Int.MinValue
    var i = 24
    while (i >= 0) { buf += ((x >>> i) & 0xff).toByte; i -= 8 }
  }

  def encodeShort(buf: ByteBuf, v: Short): Unit = {
    val x = v ^ Short.MinValue
    buf += ((x >>> 8) & 0xff).toByte; buf += (x & 0xff).toByte
  }

  def encodeByteV(buf: ByteBuf, v: Byte): Unit =
    buf += (v ^ 0x80).toByte

  /** Double → total-order bits (sign flip for positives, full complement
    * for negatives), big-endian. NaN sorts above all (as in
    * java.lang.Double.compare). */
  def encodeDouble(buf: ByteBuf, v: Double): Unit = {
    val bits = java.lang.Double.doubleToLongBits(v) // canonical NaN
    val x = if (bits < 0) ~bits else bits ^ Long.MinValue
    var i = 56
    while (i >= 0) { buf += ((x >>> i) & 0xff).toByte; i -= 8 }
  }

  def encodeFloat(buf: ByteBuf, v: Float): Unit = {
    val bits = java.lang.Float.floatToIntBits(v)
    val x = if (bits < 0) ~bits else bits ^ Int.MinValue
    var i = 24
    while (i >= 0) { buf += ((x >>> i) & 0xff).toByte; i -= 8 }
  }

  /** Variable-length bytes: escape 0x00 as (0x00,0xFF), terminate with
    * (0x00,0x00). Prefixes order correctly; the terminator sorts below
    * any content byte — same property as the reference's base-7
    * continuation encoding (Types.hs:141-177), simpler layout. */
  def encodeBytes(buf: ByteBuf, v: Array[Byte]): Unit = {
    var i = 0
    while (i < v.length) {
      val b = v(i)
      if (b == 0) { buf += 0; buf += -1 } else buf += b
      i += 1
    }
    buf += 0; buf += 0
  }

  /** UTF-8 preserves code-point order (Types.hs:181-183). */
  def encodeString(buf: ByteBuf, v: String): Unit =
    encodeBytes(buf, v.getBytes(StandardCharsets.UTF_8))

  /** Decimal(p ≤ 38, s): scale-normalize to the COLUMN's scale (every
    * value of the column shares it, so unscaled order == value order),
    * then the unscaled integer as fixed 16-byte big-endian
    * two's-complement with the sign bit flipped — the same
    * sign-flip-big-endian recipe as the int encoders, widened to the
    * 38-digit range (10^38 < 2^127). Order-preserving within the
    * column; decimal primary keys (money schemas) become graft keys. */
  def encodeDecimal(buf: ByteBuf, unscaled: java.math.BigInteger): Unit = {
    val src = unscaled.toByteArray // minimal big-endian two's complement
    require(src.length <= 16, s"decimal unscaled value exceeds 128 bits: $unscaled")
    val fill: Byte = if (unscaled.signum() < 0) -1 else 0
    var i = 0
    val pad = 16 - src.length
    while (i < 16) {
      val b = if (i < pad) fill else src(i - pad)
      buf += (if (i == 0) (b ^ 0x80).toByte else b)
      i += 1
    }
  }

  // ---- field decoding (metadata-only aggregates) ----------------------

  /** Inverse of [[fieldEncoder]] for SCALAR types, as a parser over a
    * marker-prefixed encoding: returns (CATALYST-internal value, next
    * offset), or None when the type has no decoder (array/struct — their
    * stats are never collected anyway). Decoding exists so chunk
    * metadata (zone-map min/max, key bounds) can answer MIN/MAX
    * aggregates without opening a single chunk file; the encoding
    * remains the only hashed artifact, so a decoder bug can never
    * corrupt a table — only a wrong (caught-by-oracle) aggregate. */
  type FieldDec = (Array[Byte], Int) => (Any, Int)
  def fieldDecoder(dt: DataType): Option[FieldDec] = {
    def beLong(a: Array[Byte], o: Int): Long = {
      var x = 0L; var i = 0
      while (i < 8) { x = (x << 8) | (a(o + i) & 0xffL); i += 1 }
      x
    }
    def beInt(a: Array[Byte], o: Int): Int = {
      var x = 0; var i = 0
      while (i < 4) { x = (x << 8) | (a(o + i) & 0xff); i += 1 }
      x
    }
    // escaped bytes: 0x00,0xFF → 0x00; 0x00,0x00 terminates
    def decBytes(a: Array[Byte], o: Int): (Array[Byte], Int) = {
      val out = new java.io.ByteArrayOutputStream()
      var i = o
      while (true) {
        val b = a(i)
        if (b == 0) {
          if (a(i + 1) == 0) return (out.toByteArray, i + 2)
          out.write(0); i += 2
        } else { out.write(b); i += 1 }
      }
      sys.error("unreachable")
    }
    val base: Option[(Array[Byte], Int) => (Any, Int)] = dt match {
      case LongType => Some((a, o) => (beLong(a, o) ^ Long.MinValue, o + 8))
      case IntegerType => Some((a, o) => (beInt(a, o) ^ Int.MinValue, o + 4))
      case ShortType => Some((a, o) =>
        ((((a(o) & 0xff) << 8 | (a(o + 1) & 0xff)) ^ 0x8000).toShort, o + 2))
      case ByteType => Some((a, o) => ((a(o) ^ 0x80).toByte, o + 1))
      case DoubleType => Some { (a, o) =>
        val x = beLong(a, o)
        val bits = if (x < 0) x ^ Long.MinValue else ~x
        (java.lang.Double.longBitsToDouble(bits), o + 8)
      }
      case FloatType => Some { (a, o) =>
        val x = beInt(a, o)
        val bits = if (x < 0) x ^ Int.MinValue else ~x
        (java.lang.Float.intBitsToFloat(bits), o + 4)
      }
      case BooleanType => Some((a, o) => (a(o) == 1, o + 1))
      case StringType => Some { (a, o) =>
        val (bs, n) = decBytes(a, o)
        (org.apache.spark.unsafe.types.UTF8String.fromBytes(bs), n)
      }
      case BinaryType => Some((a, o) => decBytes(a, o))
      case d: DecimalType => Some { (a, o) =>
        val raw = java.util.Arrays.copyOfRange(a, o, o + 16)
        raw(0) = (raw(0) ^ 0x80).toByte
        val unscaled = new java.math.BigInteger(raw)
        (org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(unscaled, d.scale), d.precision, d.scale),
          o + 16)
      }
      // timestamps/dates encode as their Catalyst-internal micros/days —
      // decode IS the internal value
      case TimestampType | TimestampNTZType =>
        Some((a, o) => (beLong(a, o) ^ Long.MinValue, o + 8))
      case DateType => Some((a, o) => (beInt(a, o) ^ Int.MinValue, o + 4))
      case _ => None
    }
    base.map { dec => (a: Array[Byte], o: Int) =>
      if (a(o) == 0) (null, o + 1)
      else { val (v, n) = dec(a, o + 1); (v, n) }
    }
  }

  // ---- row-level encoding ---------------------------------------------

  final class ByteBuf(initial: Int = 64) {
    private var arr = new Array[Byte](initial)
    private var len = 0
    def +=(b: Byte): Unit = {
      if (len == arr.length) arr = java.util.Arrays.copyOf(arr, len * 2)
      arr(len) = b; len += 1
    }
    def appendRaw(bs: Array[Byte]): Unit = { var i = 0; while (i < bs.length) { this += bs(i); i += 1 } }
    def toBytes: Array[Byte] = java.util.Arrays.copyOf(arr, len)
    def reset(): Unit = len = 0
    def length: Int = len
  }

  type FieldEnc = (ByteBuf, Any) => Unit

  /** Encoder for one field; null → 0x00, non-null → 0x01 ++ payload
    * (NULLS FIRST, like the reference's Maybe encoding Types.hs:188-196). */
  def fieldEncoder(dt: DataType): FieldEnc = {
    val base: FieldEnc = dt match {
      case LongType => (b, v) => encodeLong(b, v.asInstanceOf[Long])
      case IntegerType => (b, v) => encodeInt(b, v.asInstanceOf[Int])
      case ShortType => (b, v) => encodeShort(b, v.asInstanceOf[Short])
      case ByteType => (b, v) => encodeByteV(b, v.asInstanceOf[Byte])
      case DoubleType => (b, v) => encodeDouble(b, v.asInstanceOf[Double])
      case FloatType => (b, v) => encodeFloat(b, v.asInstanceOf[Float])
      case BooleanType => (b, v) => b += (if (v.asInstanceOf[Boolean]) 1 else 0)
      case StringType => (b, v) => encodeString(b, v.asInstanceOf[String])
      case BinaryType => (b, v) => encodeBytes(b, v.asInstanceOf[Array[Byte]])
      case dt: DecimalType => (b, v) => {
        val bd = v match {
          case d: java.math.BigDecimal => d
          case d: scala.math.BigDecimal => d.bigDecimal
          case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
          case other => throw new IllegalArgumentException(s"not a decimal: $other")
        }
        // values of a DecimalType(p,s) column carry scale s already;
        // setScale is belt-and-braces (exact by construction)
        encodeDecimal(b, bd.setScale(dt.scale).unscaledValue())
      }
      case TimestampType => (b, v) =>
        encodeLong(b, DateTimeUtil.timestampMicros(v))
      case TimestampNTZType => (b, v) =>
        encodeLong(b, DateTimeUtil.localMicros(v))
      case DateType => (b, v) => encodeInt(b, DateTimeUtil.dateDays(v))
      case ArrayType(et, _) =>
        val elem = fieldEncoder(et)
        (b, v) => {
          val seq = v.asInstanceOf[scala.collection.Seq[Any]]
          // element-count-last so that prefix arrays sort first: encode each
          // element with a 0x01 continuation marker, terminate with 0x00.
          seq.foreach { e => b += 1; elem(b, e) }
          b += 0
        }
      case st: StructType =>
        val encs = st.fields.map(f => fieldEncoder(f.dataType))
        (b, v) => {
          val r = v.asInstanceOf[Row]
          var i = 0
          while (i < encs.length) { encs(i)(b, if (r.isNullAt(i)) null else r.get(i)); i += 1 }
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported key/value type: $other")
    }
    (b, v) => if (v == null) b += 0 else { b += 1; base(b, v) }
  }

  /** [[rowEncoder]] variant that also returns the END offset of every
    * encoded column, so callers can slice per-column encodings out of
    * the row bytes without re-encoding (zone-map stats collection). */
  def rowEncoderSliced(schema: StructType, cols: Seq[String])
      : Row => (Array[Byte], Array[Int]) = {
    val idx = cols.map(schema.fieldIndex).toArray
    val encs = idx.map(i => fieldEncoder(schema.fields(i).dataType))
    row => {
      val buf = new ByteBuf(64)
      val ends = new Array[Int](idx.length)
      var i = 0
      while (i < idx.length) {
        val j = idx(i)
        encs(i)(buf, if (row.isNullAt(j)) null else row.get(j))
        ends(i) = buf.length
        i += 1
      }
      (buf.toBytes, ends)
    }
  }

  /** Row → canonical bytes for the given column indices. */
  def rowEncoder(schema: StructType, cols: Seq[String]): Row => Array[Byte] = {
    val idx = cols.map(schema.fieldIndex).toArray
    val encs = idx.map(i => fieldEncoder(schema.fields(i).dataType))
    row => {
      val buf = new ByteBuf(64)
      var i = 0
      while (i < idx.length) {
        val j = idx(i)
        encs(i)(buf, if (row.isNullAt(j)) null else row.get(j))
        i += 1
      }
      buf.toBytes
    }
  }
}

/** External-type conversions for temporal values as surfaced by Row. */
object DateTimeUtil {
  def timestampMicros(v: Any): Long = v match {
    case t: java.sql.Timestamp =>
      t.getTime * 1000L + (t.getNanos / 1000) % 1000
    case i: java.time.Instant =>
      i.getEpochSecond * 1000000L + i.getNano / 1000
    case l: java.lang.Long => l
    case other => throw new IllegalArgumentException(s"not a timestamp: $other")
  }
  def localMicros(v: Any): Long = v match {
    case d: java.time.LocalDateTime =>
      val i = d.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000
    case l: java.lang.Long => l
    case other => throw new IllegalArgumentException(s"not a local timestamp: $other")
  }
  def dateDays(v: Any): Int = v match {
    case d: java.sql.Date => Math.toIntExact(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => Math.toIntExact(d.toEpochDay)
    case i: java.lang.Integer => i
    case other => throw new IllegalArgumentException(s"not a date: $other")
  }

  /** "yyyy-MM-dd[ HH:mm:ss[.f…]]" — date-only strings default to
    * midnight. Shared by every surface that parses wall-clock bounds
    * (CLI keys, SQL DELETE ranges) so they agree on the grammar. */
  val wallClockFmt: java.time.format.DateTimeFormatter = {
    import java.time.temporal.ChronoField._
    new java.time.format.DateTimeFormatterBuilder()
      .appendPattern("yyyy-MM-dd[ HH:mm:ss]")
      .appendFraction(NANO_OF_SECOND, 0, 9, true)
      .parseDefaulting(HOUR_OF_DAY, 0)
      .parseDefaulting(MINUTE_OF_HOUR, 0)
      .parseDefaulting(SECOND_OF_MINUTE, 0)
      .toFormatter
  }

  /** Parse a wall-clock string in the SESSION timezone (the zone Spark
    * used when casting strings at ingest) — never the JVM default. */
  def sessionTimestamp(spark: org.apache.spark.sql.SparkSession,
      s: String): java.sql.Timestamp = {
    val zone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone"))
    val local = java.time.LocalDateTime.parse(s, wallClockFmt)
    java.sql.Timestamp.from(local.atZone(zone).toInstant)
  }
}
