package graft.lwes

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

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
  * Unlike the reference (which always materializes every attribute —
  * EventSerDe.java:199-215 walks a fully-parsed org.lwes.Event), this
  * codec supports '''projected parsing''': skip attribute values that
  * the query did not request, so a journal scan touches only the bytes
  * it needs.
  */
object LwesCodec {

  // ---------------------------------------------------------------- write

  def serializedSize(ev: LwesEvent): Int = {
    var n = 1 + ev.name.getBytes(UTF_8).length + 2
    var i = 0
    while (i < ev.attrs.length) {
      val a = ev.attrs(i)
      n += 1 + a.key.getBytes(UTF_8).length + 1 + valueSize(a)
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

  private def valueSize(a: LwesAttr): Int = a.token match {
    case LwesType.Str => 2 + a.value.asInstanceOf[String].getBytes(UTF_8).length
    case LwesType.StrArray =>
      2 + a.value.asInstanceOf[Array[String]]
        .map(s => 2 + s.getBytes(UTF_8).length).sum
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
          case LwesType.Str => 2 + v(j).asInstanceOf[String].getBytes(UTF_8).length
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
    val buf = ByteBuffer.allocate(serializedSize(ev)) // big-endian default
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
      writeValue(buf, a.token, a.value)
      i += 1
    }
    buf.array()
  }

  private def writeValue(buf: ByteBuffer, token: Byte, value: Any): Unit =
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
        val s = value.asInstanceOf[String].getBytes(UTF_8)
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
          writeValue(buf, et, java.lang.reflect.Array.get(value, j))
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
          if (v(j) != null) writeValue(buf, et, v(j))
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
      wanted: String => Boolean): LwesEvent = {
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
      if (wanted == null || wanted(key)) {
        ev.attrs += LwesAttr(key, token, readValue(buf, token, key))
      } else {
        skipValue(buf, token, key)
      }
      i += 1
    }
    ev
  }

  /** Decode one value of `token` from `buf` (shared with the columnar
    * reader's modern-token slow path so the two cannot drift). */
  private[graft] def readValue(buf: ByteBuffer, token: Byte, key: String): Any =
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
        new String(sb, UTF_8)
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
          readValue(buf, LwesType.Str, key).asInstanceOf[String])
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
            out(j) = readValue(buf, et, key).asInstanceOf[AnyRef]
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
