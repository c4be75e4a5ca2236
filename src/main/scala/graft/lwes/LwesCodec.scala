package graft.lwes

import java.nio.ByteBuffer
import java.nio.charset.Charset
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** Binary codec for the classic LWES event wire format.
  *
  * Layout (big-endian throughout; see SURVEY.md §3, public lwes.org
  * format, consumed by the reference via lwes-java —
  * reference DatagramPacketInputStream.java:41-87):
  *
  * {{{
  * event := byte nameLen | name | uint16 attrCount | attr*
  * attr  := byte keyLen | key | byte typeToken | value
  * }}}
  *
  * Strings are uint16-length-prefixed UTF-8. IPADDR is 4 bytes stored
  * reversed on the wire (classic LWES quirk).
  *
  * '''String encoding (`enc`, r18)''': classic lwes-java events may
  * carry a reserved int16 attribute named `enc` marking the charset of
  * string VALUES — 0 = ISO-8859-1, 1 = UTF-8 (lwes-java
  * Event.ENCODING / ISO_8859_1 / UTF_8 constants; the default is
  * UTF-8, and lwes-java serializes the encoding attribute FIRST so
  * readers know it before any string value). This codec honors it on
  * both directions: reads decode string scalars/array elements with
  * the declared charset (an `enc` that arrives AFTER the first
  * attribute restarts the record's parse with the right charset — a
  * rare foreign shape, never silent mojibake), an out-of-range `enc`
  * is named record corruption, and [[serialize]] encodes string
  * values ISO-8859-1 whenever the event itself carries `enc` = 0
  * (unmappable characters fail loudly), so deserialize∘serialize
  * stays byte-stable for Latin-1 journals. Event NAMES and attribute
  * KEYS stay UTF-8 — lwes-java restricts both to ASCII identifiers,
  * where the charsets agree. The reference ignores `enc` entirely (no
  * encoding handling anywhere in EventSerDe.java), so this is
  * beyond-reference coverage of the public lwes-java behavior.
  *
  * Unlike the reference (which always materializes every attribute —
  * EventSerDe.java:199-215 walks a fully-parsed org.lwes.Event), this
  * codec supports '''projected parsing''': skip attribute values that
  * the query did not request, so a journal scan touches only the bytes
  * it needs.
  */
object LwesCodec {

  // ---------------------------------------------------------------- write

  /** The reserved lwes-java string-encoding attribute (Event.ENCODING):
    * int16, 0 = ISO-8859-1, 1 = UTF-8 (the default when absent). */
  val EncAttr = "enc"
  val EncIso88591: Short = 0
  val EncUtf8: Short = 1

  /** Charset the event's own `enc` attribute declares for its string
    * values (UTF-8 when absent — lwes-java DEFAULT_ENCODING). An
    * out-of-range value fails the WRITE loudly: both readers reject it
    * as record corruption, so serializing it would produce a journal
    * whose records silently vanish on read. */
  private def charsetOf(ev: LwesEvent): Charset =
    ev.get(EncAttr) match {
      case Some(a) if a.token == LwesType.Int16 =>
        a.value match {
          case EncIso88591 => ISO_8859_1
          case EncUtf8 => UTF_8
          case other => throw new IllegalArgumentException(
            s"unsupported enc value $other (0=ISO-8859-1, 1=UTF-8)")
        }
      case _ => UTF_8
    }

  /** Encode a string VALUE with the event charset; ISO-8859-1 fails
    * loudly on unmappable characters (String.getBytes would silently
    * write '?'). */
  private def strBytes(s: String, cs: Charset): Array[Byte] =
    if (cs eq UTF_8) s.getBytes(UTF_8)
    else {
      val out = new Array[Byte](s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c > 0xff) throw new IllegalArgumentException(
          f"string value not representable in ISO-8859-1 (char U+${c.toInt}%04X " +
            s"at index $i) — drop the enc=0 attribute to write UTF-8")
        out(i) = c.toByte
        i += 1
      }
      out
    }

  def serializedSize(ev: LwesEvent): Int = serializedSize(ev, charsetOf(ev))

  private def serializedSize(ev: LwesEvent, cs: Charset): Int = {
    var n = 1 + ev.name.getBytes(UTF_8).length + 2
    var i = 0
    while (i < ev.attrs.length) {
      val a = ev.attrs(i)
      n += 1 + a.key.getBytes(UTF_8).length + 1 + valueSize(a, cs)
      i += 1
    }
    n
  }

  private[graft] def scalarFixedSize(token: Byte): Int = token match {
    case LwesType.UInt16 | LwesType.Int16 => 2
    case LwesType.UInt32 | LwesType.Int32 | LwesType.Float => 4
    case LwesType.Int64 | LwesType.UInt64 | LwesType.Double => 8
    case LwesType.Bool | LwesType.ByteT => 1
    case LwesType.IpAddr => 4
    case _ => -1 // variable (string) or unknown
  }

  private def valueSize(a: LwesAttr, cs: Charset = UTF_8): Int = a.token match {
    case LwesType.Str => 2 + strBytes(a.value.asInstanceOf[String], cs).length
    case LwesType.StrArray =>
      2 + a.value.asInstanceOf[Array[String]]
        .map(s => 2 + strBytes(s, cs).length).sum
    case t if LwesType.isArray(t) =>
      val n = java.lang.reflect.Array.getLength(a.value)
      2 + n * scalarFixedSize(LwesType.elementOf(t))
    case t if LwesType.isNullableArray(t) =>
      val v = a.value.asInstanceOf[Array[AnyRef]]
      val et = LwesType.elementOfNullable(t)
      var sz = 2 + 2 + (v.length + 7) / 8 // count + bitset bit count + bitset
      var j = 0
      while (j < v.length) {
        if (v(j) != null) sz += (et match {
          case LwesType.Str => 2 + strBytes(v(j).asInstanceOf[String], cs).length
          case e => scalarFixedSize(e)
        })
        j += 1
      }
      sz
    case t =>
      val n = scalarFixedSize(t)
      if (n < 0) throw new IllegalArgumentException(s"bad token $t")
      n
  }

  /** Wire encoding of one attribute VALUE alone (no key/token prefix).
    * Pre-encodes ESF defaults so the vectorized reader materializes
    * them through the same typed writers wire-present values take. */
  private[graft] def encodeValue(a: LwesAttr): Array[Byte] = {
    val buf = ByteBuffer.allocate(valueSize(a))
    writeValue(buf, a.token, a.value)
    buf.array()
  }

  def serialize(ev: LwesEvent): Array[Byte] = {
    val cs = charsetOf(ev)
    val buf = ByteBuffer.allocate(serializedSize(ev, cs)) // big-endian default
    val nameB = ev.name.getBytes(UTF_8)
    require(nameB.length <= 255, s"event name too long: ${ev.name}")
    buf.put(nameB.length.toByte).put(nameB)
    buf.putShort(ev.attrs.length.toShort)
    var i = 0
    while (i < ev.attrs.length) {
      val a = ev.attrs(i)
      val keyB = a.key.getBytes(UTF_8)
      require(keyB.length <= 255, s"attr key too long: ${a.key}")
      buf.put(keyB.length.toByte).put(keyB).put(a.token)
      writeValue(buf, a.token, a.value, cs)
      i += 1
    }
    buf.array()
  }

  private def writeValue(buf: ByteBuffer, token: Byte, value: Any,
      cs: Charset = UTF_8): Unit =
    token match {
      case LwesType.UInt16 => buf.putShort(value.asInstanceOf[Int].toShort)
      case LwesType.Int16 => buf.putShort(value.asInstanceOf[Short])
      case LwesType.UInt32 => buf.putInt(value.asInstanceOf[Long].toInt)
      case LwesType.Int32 => buf.putInt(value.asInstanceOf[Int])
      case LwesType.Int64 | LwesType.UInt64 => buf.putLong(value.asInstanceOf[Long])
      case LwesType.Bool => buf.put(if (value.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
      case LwesType.ByteT => buf.put(value.asInstanceOf[Byte])
      case LwesType.Float => buf.putFloat(value.asInstanceOf[Float])
      case LwesType.Double => buf.putDouble(value.asInstanceOf[Double])
      case LwesType.IpAddr =>
        val ip = value.asInstanceOf[Array[Byte]]
        // reversed byte order on the wire
        buf.put(ip(3)).put(ip(2)).put(ip(1)).put(ip(0))
      case LwesType.Str =>
        val s = strBytes(value.asInstanceOf[String], cs)
        require(s.length <= 65535, "string attr too long")
        buf.putShort(s.length.toShort).put(s)
      // arrays: uint16 element count, then elements in scalar encodings
      case t if LwesType.isArray(t) =>
        val et = LwesType.elementOf(t)
        val n = java.lang.reflect.Array.getLength(value)
        require(n <= 65535, "array attr too long")
        buf.putShort(n.toShort)
        var j = 0
        while (j < n) {
          writeValue(buf, et, java.lang.reflect.Array.get(value, j), cs)
          j += 1
        }
      // nullable arrays: uint16 TOTAL count, uint16 bitset size in
      // BITS (== count; lwes-java serializeBitSet writes the capacity
      // and deserializeBitSet derives ceil(size/8) bytes), the
      // ceil(count/8) presence-bitset bytes (bit i LSB-first =
      // element i present), then the PRESENT elements only in their
      // scalar encodings
      case t if LwesType.isNullableArray(t) =>
        val et = LwesType.elementOfNullable(t)
        val v = value.asInstanceOf[Array[AnyRef]]
        require(v.length <= 65535, "array attr too long")
        buf.putShort(v.length.toShort)
        val nb = (v.length + 7) / 8
        buf.putShort(v.length.toShort) // bitset capacity in bits
        val bits = new Array[Byte](nb)
        var j = 0
        while (j < v.length) {
          if (v(j) != null) bits(j >> 3) = (bits(j >> 3) | (1 << (j & 7))).toByte
          j += 1
        }
        buf.put(bits)
        j = 0
        while (j < v.length) {
          if (v(j) != null) writeValue(buf, et, v(j), cs)
          j += 1
        }
      case t => throw new IllegalArgumentException(s"bad token $t")
    }

  // ----------------------------------------------------------------- read

  /** Peek just the event name (first field) without parsing attributes. */
  def eventName(bytes: Array[Byte], offset: Int): String = {
    val n = bytes(offset) & 0xff
    new String(bytes, offset + 1, n, UTF_8)
  }

  def deserialize(bytes: Array[Byte]): LwesEvent =
    deserialize(bytes, 0, bytes.length, null)

  /** Parse an event; when `wanted` is non-null only attributes whose key
    * passes are materialized, the rest are length-skipped. */
  def deserialize(bytes: Array[Byte], offset: Int, length: Int,
      wanted: String => Boolean): LwesEvent =
    deserialize(bytes, offset, length, wanted, UTF_8)

  private def deserialize(bytes: Array[Byte], offset: Int, length: Int,
      wanted: String => Boolean, cs0: Charset): LwesEvent = {
    var cs = cs0
    val buf = ByteBuffer.wrap(bytes, offset, length)
    val nameLen = buf.get() & 0xff
    val nameB = new Array[Byte](nameLen)
    buf.get(nameB)
    val ev = new LwesEvent(new String(nameB, UTF_8))
    val count = buf.getShort() & 0xffff
    var i = 0
    while (i < count && buf.hasRemaining) {
      val keyLen = buf.get() & 0xff
      val keyB = new Array[Byte](keyLen)
      buf.get(keyB)
      val key = new String(keyB, UTF_8)
      val token = buf.get()
      // the reserved lwes-java string-encoding attribute: honored for
      // every string value of the record, whether or not projected
      if (token == LwesType.Int16 && key == EncAttr && buf.remaining() >= 2) {
        val e = buf.getShort(buf.position())
        if (e != EncIso88591 && e != EncUtf8)
          throw new IllegalArgumentException(
            s"unsupported enc value $e (0=ISO-8859-1, 1=UTF-8)")
        if (e == EncIso88591 && (cs eq UTF_8)) {
          // lwes-java serializes enc FIRST; a foreign record declaring
          // ISO-8859-1 after other attributes restarts the parse so
          // earlier string values are never silently mis-decoded
          if (i == 0) cs = ISO_8859_1
          else return deserialize(bytes, offset, length, wanted, ISO_8859_1)
        }
      }
      if (wanted == null || wanted(key)) {
        ev.attrs += LwesAttr(key, token, readValue(buf, token, key, cs))
      } else {
        skipValue(buf, token, key)
      }
      i += 1
    }
    ev
  }

  /** Decode one value of `token` from `buf` (shared with the columnar
    * reader's modern-token slow path so the two cannot drift). `cs` is
    * the record's declared string charset (`enc` attribute). */
  private[graft] def readValue(buf: ByteBuffer, token: Byte, key: String,
      cs: Charset = UTF_8): Any =
    token match {
      case LwesType.UInt16 => buf.getShort() & 0xffff
      case LwesType.Int16 => buf.getShort()
      case LwesType.UInt32 => buf.getInt().toLong & 0xffffffffL
      case LwesType.Int32 => buf.getInt()
      case LwesType.Int64 | LwesType.UInt64 => buf.getLong()
      case LwesType.Bool => buf.get() != 0
      case LwesType.ByteT => buf.get()
      case LwesType.Float => buf.getFloat()
      case LwesType.Double => buf.getDouble()
      case LwesType.IpAddr =>
        val d = buf.get(); val c = buf.get(); val b = buf.get(); val a = buf.get()
        Array(a, b, c, d) // un-reverse to network order
      case LwesType.Str =>
        val len = buf.getShort() & 0xffff
        val sb = new Array[Byte](len)
        buf.get(sb)
        new String(sb, cs)
      // arrays land as the primitive array types LwesEvent's setters
      // take, so serialize(deserialize(x)) is byte-stable
      case LwesType.UInt16Array => fillArray(buf, new Array[Int](arrLen(buf)))(_ => buf.getShort() & 0xffff)
      case LwesType.Int16Array => fillArray(buf, new Array[Short](arrLen(buf)))(_ => buf.getShort())
      case LwesType.UInt32Array => fillArray(buf, new Array[Long](arrLen(buf)))(_ => buf.getInt().toLong & 0xffffffffL)
      case LwesType.Int32Array => fillArray(buf, new Array[Int](arrLen(buf)))(_ => buf.getInt())
      case LwesType.Int64Array | LwesType.UInt64Array => fillArray(buf, new Array[Long](arrLen(buf)))(_ => buf.getLong())
      case LwesType.BoolArray => fillArray(buf, new Array[Boolean](arrLen(buf)))(_ => buf.get() != 0)
      case LwesType.ByteArray => fillArray(buf, new Array[Byte](arrLen(buf)))(_ => buf.get())
      case LwesType.FloatArray => fillArray(buf, new Array[Float](arrLen(buf)))(_ => buf.getFloat())
      case LwesType.DoubleArray => fillArray(buf, new Array[Double](arrLen(buf)))(_ => buf.getDouble())
      case LwesType.StrArray =>
        fillArray(buf, new Array[String](arrLen(buf)))(_ =>
          readValue(buf, LwesType.Str, key, cs).asInstanceOf[String])
      case LwesType.IpAddrArray =>
        fillArray(buf, new Array[Array[Byte]](arrLen(buf)))(_ =>
          readValue(buf, LwesType.IpAddr, key).asInstanceOf[Array[Byte]])
      // nullable arrays land as boxed object arrays with null holes —
      // element boxing matches the scalar readers, so serialize(
      // deserialize(x)) stays byte-stable for values THIS codec wrote
      // (token + null positions kept; garbage bits ABOVE the element
      // count inside the final bitset byte are tolerated on read —
      // lwes-java writes zeros there — and re-serialize normalized;
      // a bitset whose declared bit count disagrees with the element
      // count is named corruption, see readBitSet)
      case t if LwesType.isNullableArray(t) =>
        val et = LwesType.elementOfNullable(t)
        val n = arrLen(buf)
        val bits = readBitSet(buf, n, key)
        val out = new Array[AnyRef](n)
        var j = 0
        while (j < n) {
          if ((bits(j >> 3) & (1 << (j & 7))) != 0)
            out(j) = readValue(buf, et, key, cs).asInstanceOf[AnyRef]
          j += 1
        }
        out
      case t => throw new IllegalArgumentException(
        s"unknown LWES type token 0x${"%02x".format(t)} for key $key")
    }

  /** Presence bitset of a nullable array: uint16 size in BITS, then
    * the ceil(size/8) bytes, bit i (LSB-first per byte) = element i
    * present — the lwes-java serializeBitSet/deserializeBitSet
    * convention (capacity header, derived byte length). The declared
    * size must equal the element count EXACTLY: every known emitter
    * writes capacity == array length, so any mismatch — including a
    * byte-count header the way graft <= r17 wrote it — is named
    * record corruption (resync'd upstream), never a silent misread
    * that would swallow element payload as bitset bytes. */
  private def readBitSet(buf: ByteBuffer, n: Int, key: String): Array[Byte] = {
    val nbits = buf.getShort() & 0xffff
    if (nbits != n) throw new IllegalArgumentException(
      s"nullable array bitset declares $nbits bits for $n elements for key $key")
    val bits = new Array[Byte]((n + 7) / 8)
    buf.get(bits)
    bits
  }

  @inline private def arrLen(buf: ByteBuffer): Int = buf.getShort() & 0xffff

  @inline private def fillArray[A](buf: ByteBuffer, arr: Array[A])(read: Int => A): Array[A] = {
    var i = 0
    while (i < arr.length) { arr(i) = read(i); i += 1 }
    arr
  }

  private def skipValue(buf: ByteBuffer, token: Byte, key: String): Unit = {
    val n = token match {
      case LwesType.Str => buf.getShort() & 0xffff
      case LwesType.StrArray =>
        val count = buf.getShort() & 0xffff
        var total = 0
        var j = 0
        while (j < count) {
          val l = buf.getShort() & 0xffff
          buf.position(buf.position() + l)
          j += 1
        }
        total
      case t if LwesType.isArray(t) =>
        (buf.getShort() & 0xffff) * scalarFixedSize(LwesType.elementOf(t))
      case t if LwesType.isNullableArray(t) =>
        val cnt = buf.getShort() & 0xffff
        val bits = readBitSet(buf, cnt, key)
        val et = LwesType.elementOfNullable(t)
        var present = 0
        var j = 0
        while (j < cnt) {
          if ((bits(j >> 3) & (1 << (j & 7))) != 0) present += 1
          j += 1
        }
        if (et == LwesType.Str) {
          var k = present
          while (k > 0) {
            val l = buf.getShort() & 0xffff
            buf.position(buf.position() + l)
            k -= 1
          }
          0
        } else present * scalarFixedSize(et)
      case t =>
        val sz = scalarFixedSize(t)
        if (sz < 0) throw new IllegalArgumentException(
          s"unknown LWES type token 0x${"%02x".format(t)} for key $key")
        sz
    }
    buf.position(buf.position() + n)
  }
}
