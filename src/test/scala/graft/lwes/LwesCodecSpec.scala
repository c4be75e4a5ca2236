package graft.lwes

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class LwesCodecSpec extends AnyFunSuite {

  private def randAttr(rnd: Random, key: String): LwesAttr = rnd.nextInt(9) match {
    case 0 => LwesAttr(key, LwesType.UInt16, rnd.nextInt(65536))
    case 1 => LwesAttr(key, LwesType.Int16, rnd.nextInt().toShort)
    case 2 => LwesAttr(key, LwesType.UInt32, rnd.nextLong() & 0xffffffffL)
    case 3 => LwesAttr(key, LwesType.Int32, rnd.nextInt())
    case 4 => LwesAttr(key, LwesType.Int64, rnd.nextLong())
    case 5 => LwesAttr(key, LwesType.UInt64, rnd.nextLong())
    case 6 => LwesAttr(key, LwesType.Bool, rnd.nextBoolean())
    case 7 => LwesAttr(key, LwesType.IpAddr,
      Array.fill(4)(rnd.nextInt(256).toByte))
    case _ => LwesAttr(key, LwesType.Str,
      rnd.alphanumeric.take(rnd.nextInt(200)).mkString)
  }

  private def randEvent(rnd: Random): LwesEvent = {
    val ev = LwesEvent("Ev" + rnd.alphanumeric.take(1 + rnd.nextInt(40)).mkString)
    val nAttrs = rnd.nextInt(20)
    (0 until nAttrs).foreach { i =>
      val a = randAttr(rnd, s"k${i}_" + rnd.alphanumeric.take(rnd.nextInt(20)).mkString)
      ev.set(a.key, a.token, a.value)
    }
    ev
  }

  private def assertSameEvent(a: LwesEvent, b: LwesEvent): Unit = {
    assert(a.name == b.name)
    assert(a.attrs.length == b.attrs.length)
    a.attrs.zip(b.attrs).foreach { case (x, y) =>
      assert(x.key == y.key)
      assert(x.token == y.token)
      (x.value, y.value) match {
        case (u: Array[Byte], v: Array[Byte]) => assert(u.sameElements(v))
        case (u, v) => assert(u == v)
      }
    }
  }

  test("round-trip: serialize then deserialize preserves 500 random events") {
    val rnd = new Random(42)
    (0 until 500).foreach { _ =>
      val ev = randEvent(rnd)
      val bytes = LwesCodec.serialize(ev)
      assertSameEvent(ev, LwesCodec.deserialize(bytes))
      // byte-stable: re-serialization is identical
      assert(LwesCodec.serialize(LwesCodec.deserialize(bytes)).sameElements(bytes))
    }
  }

  test("all nine classic types round-trip with exact values") {
    val ev = LwesEvent("Test::Event")
      .setUInt16("u16", 65535)
      .setInt16("i16", -32768)
      .setUInt32("u32", 4294967295L)
      .setInt32("i32", Int.MinValue)
      .setString("s", "héllo wörld")
      .setIpAddr("ip", Array(10, 1, 2, 254.toByte))
      .setInt64("i64", Long.MinValue)
      .setUInt64("u64", -1L)
      .setBool("b", true)
    val back = LwesCodec.deserialize(LwesCodec.serialize(ev))
    assert(back.get("u16").get.value == 65535)
    assert(back.get("i16").get.value == (-32768: Short))
    assert(back.get("u32").get.value == 4294967295L)
    assert(back.get("i32").get.value == Int.MinValue)
    assert(back.get("s").get.value == "héllo wörld")
    assert(LwesEvent.ipToString(back.get("ip").get.value.asInstanceOf[Array[Byte]]) == "10.1.2.254")
    assert(back.get("i64").get.value == Long.MinValue)
    assert(back.get("u64").get.value == -1L)
    assert(back.get("b").get.value == true)
  }

  test("ipaddr wire bytes are reversed (classic LWES quirk)") {
    val ev = LwesEvent("E").setIpAddr("ip", Array(1, 2, 3, 4))
    val bytes = LwesCodec.serialize(ev)
    // layout: 1+1("E")+2 + 1+2("ip")+1(token) = 8 bytes before the value
    assert(bytes.slice(8, 12).toSeq == Seq[Byte](4, 3, 2, 1))
  }

  test("projected parse materializes only wanted attrs, skips the rest") {
    val ev = LwesEvent("E")
      .setInt32("a", 1).setString("big", "x" * 1000).setInt64("c", 7L)
    val bytes = LwesCodec.serialize(ev)
    val proj = LwesCodec.deserialize(bytes, 0, bytes.length, Set("a", "c"))
    assert(proj.attrs.map(_.key) == Seq("a", "c"))
    assert(proj.get("a").get.value == 1)
    assert(proj.get("c").get.value == 7L)
  }

  test("eventName peeks without full parse") {
    val bytes = LwesCodec.serialize(LwesEvent("My::Event").setInt32("x", 5))
    assert(LwesCodec.eventName(bytes, 0) == "My::Event")
  }
}
