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

  def name(token: Byte): String = token match {
    case UInt16 => "uint16"; case Int16 => "int16"; case UInt32 => "uint32"
    case Int32 => "int32"; case Str => "string"; case IpAddr => "ipaddr"
    case Int64 => "int64"; case UInt64 => "uint64"; case Bool => "boolean"
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
