package graft.lwes

import scala.collection.mutable.ArrayBuffer

/** LWES classic type tokens, as on the wire.
  *
  * Re-derived from the public LWES wire format (lwes.org) that the
  * reference consumes via lwes-java (see
  * reference EventSerDe.java:240-301 for the type surface the SerDe
  * exposes: boolean, int16, int32, int64, string, ipaddr, plus
  * float/double encoded as strings).
  */
object LwesType {
  val UInt16: Byte = 0x01
  val Int16: Byte = 0x02
  val UInt32: Byte = 0x03
  val Int32: Byte = 0x04
  val Str: Byte = 0x05
  val IpAddr: Byte = 0x06
  val Int64: Byte = 0x07
  val UInt64: Byte = 0x08
  val Bool: Byte = 0x09
  // Modern lwes scalar tokens (public lwes-java TypeID; the reference
  // SerDe predates them — EventSerDe.java:240-301 handles only the 9
  // classic tokens above, so emitters using these are unreadable there).
  val ByteT: Byte = 0x0a
  val Float: Byte = 0x0b
  val Double: Byte = 0x0c
  // Modern lwes array tokens: element token | 0x80. Wire layout is a
  // uint16 element count followed by the elements in their scalar
  // encodings (strings uint16-length-prefixed, ipaddr 4B reversed).
  val ArrayBit: Byte = 0x80.toByte
  val UInt16Array: Byte = (UInt16 | 0x80).toByte
  val Int16Array: Byte = (Int16 | 0x80).toByte
  val UInt32Array: Byte = (UInt32 | 0x80).toByte
  val Int32Array: Byte = (Int32 | 0x80).toByte
  val StrArray: Byte = (Str | 0x80).toByte
  val IpAddrArray: Byte = (IpAddr | 0x80).toByte
  val Int64Array: Byte = (Int64 | 0x80).toByte
  val UInt64Array: Byte = (UInt64 | 0x80).toByte
  val BoolArray: Byte = (Bool | 0x80).toByte
  val ByteArray: Byte = (ByteT | 0x80).toByte
  val FloatArray: Byte = (Float | 0x80).toByte
  val DoubleArray: Byte = (Double | 0x80).toByte
  // Nullable-array tokens (N_*_ARRAY): the classic array token shifted
  // up by 0x0c, so they run contiguously 0x8d (nullable uint16[]) ..
  // 0x98 (nullable double[]). Wire layout is a uint16 TOTAL element
  // count, a uint16 presence-bitset size in BITS (== the count: the
  // lwes-java Serializer.serializeBitSet / Deserializer
  // .deserializeBitSet convention — the header carries the capacity
  // and the reader derives ceil(size/8) bytes), the ceil(count/8)
  // bitset bytes (bit i, LSB-first within each byte, = element i is
  // PRESENT), then only the present elements in their scalar
  // encodings. r18: the bit-count header replaced a graft-specific
  // byte-count guess after advisory review; the reader requires the
  // header to equal the element count EXACTLY, so a journal written
  // under any other convention (including graft <= r17) fails as
  // named record corruption and resyncs — never a silent misread.
  // Verified by round-trip + both-path parity + fuzz (the A23
  // epistemic standard — no conformant emitter is reachable offline);
  // tokens beyond this range keep the checked unknown-token resync
  // boundary.
  private val NullableShift = 0x0c
  val NUInt16Array: Byte = nullableOf(UInt16Array)
  val NInt16Array: Byte = nullableOf(Int16Array)
  val NUInt32Array: Byte = nullableOf(UInt32Array)
  val NInt32Array: Byte = nullableOf(Int32Array)
  val NStrArray: Byte = nullableOf(StrArray)
  val NIpAddrArray: Byte = nullableOf(IpAddrArray)
  val NInt64Array: Byte = nullableOf(Int64Array)
  val NUInt64Array: Byte = nullableOf(UInt64Array)
  val NBoolArray: Byte = nullableOf(BoolArray)
  val NByteArray: Byte = nullableOf(ByteArray)
  val NFloatArray: Byte = nullableOf(FloatArray)
  val NDoubleArray: Byte = nullableOf(DoubleArray)

  /** The highest scalar token an array token may wrap (0x0c = double). */
  private val MaxElement: Byte = Double

  def isArray(token: Byte): Boolean =
    (token & 0x80) != 0 && (token & 0x7f) >= UInt16 && (token & 0x7f) <= MaxElement

  def isNullableArray(token: Byte): Boolean = {
    val t = token & 0xff
    t >= (NUInt16Array & 0xff) && t <= (NDoubleArray & 0xff)
  }

  /** Nullable-array token for a classic array token. */
  def nullableOf(arrayToken: Byte): Byte =
    ((arrayToken & 0xff) + NullableShift).toByte

  /** Element token of an array token (caller checks isArray). */
  def elementOf(token: Byte): Byte = (token & 0x7f).toByte

  /** Element token of a nullable-array token (caller checks
    * isNullableArray). */
  def elementOfNullable(token: Byte): Byte =
    ((token & 0xff) - NullableShift - 0x80).toByte

  /** Element token of EITHER array family (caller checks isArray ||
    * isNullableArray) — the one place the two token ranges map to
    * their element, so conversion/display call sites cannot drift. */
  def elementTokenOf(token: Byte): Byte =
    if (isArray(token)) elementOf(token) else elementOfNullable(token)

  def name(token: Byte): String = token match {
    case UInt16 => "uint16"; case Int16 => "int16"; case UInt32 => "uint32"
    case Int32 => "int32"; case Str => "string"; case IpAddr => "ipaddr"
    case Int64 => "int64"; case UInt64 => "uint64"; case Bool => "boolean"
    case ByteT => "byte"; case Float => "float"; case Double => "double"
    case t if isArray(t) => name(elementOf(t)) + "[]"
    case t if isNullableArray(t) => "nullable " + name(elementOfNullable(t)) + "[]"
    case t => s"unknown(0x${"%02x".format(t)})"
  }
}

/** One attribute: key, wire type token, JVM value.
  *
  * Value representations: UInt16→Int, Int16→Short, UInt32→Long,
  * Int32→Int, Str→String, IpAddr→Array[Byte](4) (network order),
  * Int64→Long, UInt64→Long (raw bits), Bool→Boolean.
  */
final case class LwesAttr(key: String, token: Byte, value: Any)

/** A mutable LWES event: name + ordered attribute list.
  *
  * Attribute order is preserved (wire order matters for byte-stable
  * round-trips). Events are small (tens of attrs), so lookup is linear.
  * Equivalent of org.lwes.Event as used by the reference
  * (EventSerDe.java:177-217, DatagramPacketInputStream.java:41-87).
  */
final class LwesEvent(var name: String) {
  val attrs: ArrayBuffer[LwesAttr] = new ArrayBuffer[LwesAttr](16)

  private def indexOf(key: String): Int = {
    var i = 0
    while (i < attrs.length) { if (attrs(i).key == key) return i; i += 1 }
    -1
  }

  def isSet(key: String): Boolean = indexOf(key) >= 0

  def get(key: String): Option[LwesAttr] = {
    val i = indexOf(key); if (i >= 0) Some(attrs(i)) else None
  }

  /** Set (replace-or-append, like org.lwes.Event setters). */
  def set(key: String, token: Byte, value: Any): LwesEvent = {
    val i = indexOf(key)
    val a = LwesAttr(key, token, value)
    if (i >= 0) attrs(i) = a else attrs += a
    this
  }

  def setUInt16(key: String, v: Int): LwesEvent = set(key, LwesType.UInt16, v)
  def setInt16(key: String, v: Short): LwesEvent = set(key, LwesType.Int16, v)
  def setUInt32(key: String, v: Long): LwesEvent = set(key, LwesType.UInt32, v)
  def setInt32(key: String, v: Int): LwesEvent = set(key, LwesType.Int32, v)
  def setString(key: String, v: String): LwesEvent = set(key, LwesType.Str, v)
  def setIpAddr(key: String, v: Array[Byte]): LwesEvent = {
    require(v.length == 4, "IPv4 only"); set(key, LwesType.IpAddr, v)
  }
  def setInt64(key: String, v: Long): LwesEvent = set(key, LwesType.Int64, v)
  def setUInt64(key: String, v: Long): LwesEvent = set(key, LwesType.UInt64, v)
  def setBool(key: String, v: Boolean): LwesEvent = set(key, LwesType.Bool, v)
  def setByte(key: String, v: Byte): LwesEvent = set(key, LwesType.ByteT, v)
  def setFloat(key: String, v: Float): LwesEvent = set(key, LwesType.Float, v)
  def setDouble(key: String, v: Double): LwesEvent = set(key, LwesType.Double, v)
  def setInt16Array(key: String, v: Array[Short]): LwesEvent = set(key, LwesType.Int16Array, v)
  def setUInt16Array(key: String, v: Array[Int]): LwesEvent = set(key, LwesType.UInt16Array, v)
  def setInt32Array(key: String, v: Array[Int]): LwesEvent = set(key, LwesType.Int32Array, v)
  def setUInt32Array(key: String, v: Array[Long]): LwesEvent = set(key, LwesType.UInt32Array, v)
  def setInt64Array(key: String, v: Array[Long]): LwesEvent = set(key, LwesType.Int64Array, v)
  def setUInt64Array(key: String, v: Array[Long]): LwesEvent = set(key, LwesType.UInt64Array, v)
  def setStringArray(key: String, v: Array[String]): LwesEvent = set(key, LwesType.StrArray, v)
  def setBoolArray(key: String, v: Array[Boolean]): LwesEvent = set(key, LwesType.BoolArray, v)
  def setByteArray(key: String, v: Array[Byte]): LwesEvent = set(key, LwesType.ByteArray, v)
  def setFloatArray(key: String, v: Array[Float]): LwesEvent = set(key, LwesType.FloatArray, v)
  def setDoubleArray(key: String, v: Array[Double]): LwesEvent = set(key, LwesType.DoubleArray, v)
  def setIpAddrArray(key: String, v: Array[Array[Byte]]): LwesEvent = {
    v.foreach(ip => require(ip.length == 4, "IPv4 only"))
    set(key, LwesType.IpAddrArray, v)
  }

  /** Nullable array (N_*_ARRAY wire tokens): `v` holds the BOXED scalar
    * representations the element token's reader produces (UInt16→Int,
    * Int16→Short, …, Str→String, IpAddr→Array[Byte](4)) with null for
    * absent elements. `elemToken` is the SCALAR element token. */
  def setNullableArray(key: String, elemToken: Byte, v: Array[AnyRef]): LwesEvent = {
    val t = LwesType.nullableOf((elemToken | LwesType.ArrayBit).toByte)
    require(LwesType.isNullableArray(t),
      s"no nullable-array token for element ${LwesType.name(elemToken)}")
    if (elemToken == LwesType.IpAddr)
      v.foreach(ip => require(ip == null ||
        ip.asInstanceOf[Array[Byte]].length == 4, "IPv4 only"))
    set(key, t, v)
  }

  override def toString: String =
    s"$name{${attrs.map(a => s"${a.key}=${a.value}").mkString(", ")}}"
}

object LwesEvent {
  /** Header-derived attribute names the journal layer injects, mirroring
    * reference DatagramPacketInputStream.java:75-78. */
  val ReceiptTime = "ReceiptTime"
  val SenderIp = "SenderIP"
  val SenderPort = "SenderPort"
  val SiteId = "SiteID"
  val HeaderAttrs: Set[String] = Set(ReceiptTime, SenderIp, SenderPort, SiteId)

  def apply(name: String): LwesEvent = new LwesEvent(name)

  def ipToString(b: Array[Byte]): String =
    s"${b(0) & 0xff}.${b(1) & 0xff}.${b(2) & 0xff}.${b(3) & 0xff}"

  def parseIp(s: String): Array[Byte] = {
    val p = s.split('.')
    require(p.length == 4, s"bad IPv4: $s")
    Array(p(0).toInt.toByte, p(1).toInt.toByte, p(2).toInt.toByte, p(3).toInt.toByte)
  }
}
