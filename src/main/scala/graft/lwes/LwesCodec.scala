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

  private def valueSize(a: LwesAttr): Int = a.token match {
    case LwesType.UInt16 | LwesType.Int16 => 2
    case LwesType.UInt32 | LwesType.Int32 => 4
    case LwesType.Int64 | LwesType.UInt64 => 8
    case LwesType.Bool => 1
    case LwesType.IpAddr => 4
    case LwesType.Str => 2 + a.value.asInstanceOf[String].getBytes(UTF_8).length
    case t => throw new IllegalArgumentException(s"bad token $t")
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
      a.token match {
        case LwesType.UInt16 => buf.putShort(a.value.asInstanceOf[Int].toShort)
        case LwesType.Int16 => buf.putShort(a.value.asInstanceOf[Short])
        case LwesType.UInt32 => buf.putInt(a.value.asInstanceOf[Long].toInt)
        case LwesType.Int32 => buf.putInt(a.value.asInstanceOf[Int])
        case LwesType.Int64 | LwesType.UInt64 => buf.putLong(a.value.asInstanceOf[Long])
        case LwesType.Bool => buf.put(if (a.value.asInstanceOf[Boolean]) 1.toByte else 0.toByte)
        case LwesType.IpAddr =>
          val ip = a.value.asInstanceOf[Array[Byte]]
          // reversed byte order on the wire
          buf.put(ip(3)).put(ip(2)).put(ip(1)).put(ip(0))
        case LwesType.Str =>
          val s = a.value.asInstanceOf[String].getBytes(UTF_8)
          require(s.length <= 65535, "string attr too long")
          buf.putShort(s.length.toShort).put(s)
      }
      i += 1
    }
    buf.array()
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
        val value: Any = token match {
          case LwesType.UInt16 => buf.getShort() & 0xffff
          case LwesType.Int16 => buf.getShort()
          case LwesType.UInt32 => buf.getInt().toLong & 0xffffffffL
          case LwesType.Int32 => buf.getInt()
          case LwesType.Int64 | LwesType.UInt64 => buf.getLong()
          case LwesType.Bool => buf.get() != 0
          case LwesType.IpAddr =>
            val d = buf.get(); val c = buf.get(); val b = buf.get(); val a = buf.get()
            Array(a, b, c, d) // un-reverse to network order
          case LwesType.Str =>
            val len = buf.getShort() & 0xffff
            val sb = new Array[Byte](len)
            buf.get(sb)
            new String(sb, UTF_8)
          case t => throw new IllegalArgumentException(
            s"unknown LWES type token 0x${"%02x".format(t)} for key $key")
        }
        ev.attrs += LwesAttr(key, token, value)
      } else {
        skipValue(buf, token, key)
      }
      i += 1
    }
    ev
  }

  private def skipValue(buf: ByteBuffer, token: Byte, key: String): Unit = {
    val n = token match {
      case LwesType.UInt16 | LwesType.Int16 => 2
      case LwesType.UInt32 | LwesType.Int32 => 4
      case LwesType.Int64 | LwesType.UInt64 => 8
      case LwesType.Bool => 1
      case LwesType.IpAddr => 4
      case LwesType.Str => buf.getShort() & 0xffff
      case t => throw new IllegalArgumentException(
        s"unknown LWES type token 0x${"%02x".format(t)} for key $key")
    }
    buf.position(buf.position() + n)
  }
}
