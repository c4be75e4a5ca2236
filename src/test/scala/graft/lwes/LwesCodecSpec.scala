package graft.lwes

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class LwesCodecSpec extends AnyFunSuite {

  private def randAttr(rnd: Random, key: String): LwesAttr = rnd.nextInt(19) match {
    case 0 => LwesAttr(key, LwesType.UInt16, rnd.nextInt(65536))
    case 1 => LwesAttr(key, LwesType.Int16, rnd.nextInt().toShort)
    case 2 => LwesAttr(key, LwesType.UInt32, rnd.nextLong() & 0xffffffffL)
    case 3 => LwesAttr(key, LwesType.Int32, rnd.nextInt())
    case 4 => LwesAttr(key, LwesType.Int64, rnd.nextLong())
    case 5 => LwesAttr(key, LwesType.UInt64, rnd.nextLong())
    case 6 => LwesAttr(key, LwesType.Bool, rnd.nextBoolean())
    case 7 => LwesAttr(key, LwesType.IpAddr,
      Array.fill(4)(rnd.nextInt(256).toByte))
    case 8 => LwesAttr(key, LwesType.Str,
      rnd.alphanumeric.take(rnd.nextInt(200)).mkString)
    // modern lwes tokens (scalar byte/float/double + arrays)
    case 9 => LwesAttr(key, LwesType.ByteT, rnd.nextInt().toByte)
    case 10 => LwesAttr(key, LwesType.Float, rnd.nextFloat())
    case 11 => LwesAttr(key, LwesType.Double, rnd.nextDouble())
    case 12 => LwesAttr(key, LwesType.Int32Array,
      Array.fill(rnd.nextInt(10))(rnd.nextInt()))
    case 13 => LwesAttr(key, LwesType.Int64Array,
      Array.fill(rnd.nextInt(10))(rnd.nextLong()))
    case 14 => LwesAttr(key, LwesType.DoubleArray,
      Array.fill(rnd.nextInt(10))(rnd.nextDouble()))
    case 15 => LwesAttr(key, LwesType.StrArray,
      Array.fill(rnd.nextInt(6))(rnd.alphanumeric.take(rnd.nextInt(30)).mkString))
    // nullable arrays (N_*_ARRAY): ~1/3 null holes
    case 16 => LwesAttr(key, LwesType.NInt32Array,
      Array.fill[AnyRef](rnd.nextInt(10))(
        if (rnd.nextInt(3) == 0) null else java.lang.Integer.valueOf(rnd.nextInt())))
    case 17 => LwesAttr(key, LwesType.NStrArray,
      Array.fill[AnyRef](rnd.nextInt(8))(
        if (rnd.nextInt(3) == 0) null
        else rnd.alphanumeric.take(rnd.nextInt(30)).mkString))
    case _ => LwesAttr(key, LwesType.NDoubleArray,
      Array.fill[AnyRef](rnd.nextInt(10))(
        if (rnd.nextInt(3) == 0) null else java.lang.Double.valueOf(rnd.nextDouble())))
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
        case (u: Array[Array[Byte]], v: Array[Array[Byte]]) =>
          assert(u.length == v.length)
          u.zip(v).foreach { case (p, q) => assert(p.sameElements(q)) }
        case (u: Array[_], v: Array[_]) => assert(u.toSeq == v.toSeq)
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

  test("modern scalar and array tokens round-trip exactly (lwes-java TypeID)") {
    val ev = LwesEvent("Modern::E")
      .setByte("by", -5: Byte)
      .setFloat("f", 3.25f)
      .setDouble("d", -2.5e-3)
      .setInt16Array("a16", Array[Short](1, -2, 32767))
      .setUInt16Array("au16", Array(0, 65535))
      .setInt32Array("a32", Array(Int.MinValue, 0, Int.MaxValue))
      .setUInt32Array("au32", Array(0L, 4294967295L))
      .setInt64Array("a64", Array(Long.MinValue, Long.MaxValue))
      .setUInt64Array("au64", Array(-1L, 7L))
      .setStringArray("as", Array("a", "", "héllo"))
      .setBoolArray("ab", Array(true, false, true))
      .setByteArray("aby", Array[Byte](1, -2, 3))
      .setFloatArray("af", Array(1.5f, -0.25f))
      .setDoubleArray("ad", Array(math.Pi, -0.0))
      .setIpAddrArray("aip", Array(Array[Byte](10, 0, 0, 1), Array[Byte](127, 0, 0, 1)))
    val bytes = LwesCodec.serialize(ev)
    assertSameEvent(ev, LwesCodec.deserialize(bytes))
    assert(LwesCodec.serialize(LwesCodec.deserialize(bytes)).sameElements(bytes))
    // wire shape: array token = element token | 0x80, uint16 count prefix
    assert(LwesType.isArray(LwesType.Int32Array))
    assert(LwesType.elementOf(LwesType.Int32Array) == LwesType.Int32)
  }

  test("projected parse length-skips unwanted ARRAY attrs") {
    val ev = LwesEvent("E")
      .setInt32("a", 1)
      .setInt64Array("big", Array.fill(500)(7L))
      .setStringArray("strs", Array.fill(20)("x" * 50))
      .setInt64("c", 9L)
    val bytes = LwesCodec.serialize(ev)
    val proj = LwesCodec.deserialize(bytes, 0, bytes.length, Set("a", "c"))
    assert(proj.attrs.map(_.key) == Seq("a", "c"))
    assert(proj.get("c").get.value == 9L)
  }

  test("tokens beyond the nullable-array range (0x99+) stay a checked boundary") {
    // splice token 0x99 (one past nullable double[]) into a valid
    // record: the parser must refuse it loudly (record-level
    // corruption), never misread it
    val bytes = LwesCodec.serialize(LwesEvent("E").setInt32("ab", 1))
    val idx = bytes.length - 5 // token byte sits before the 4-byte int32
    assert(bytes(idx) == LwesType.Int32)
    bytes(idx) = 0x99.toByte
    val e = intercept[IllegalArgumentException](LwesCodec.deserialize(bytes))
    assert(e.getMessage.contains("unknown LWES type token"))
  }

  test("nullable-array tokens run 0x8d..0x98 in classic array order") {
    assert(LwesType.NUInt16Array == 0x8d.toByte)
    assert(LwesType.NInt16Array == 0x8e.toByte)
    assert(LwesType.NUInt32Array == 0x8f.toByte)
    assert(LwesType.NInt32Array == 0x90.toByte)
    assert(LwesType.NStrArray == 0x91.toByte)
    assert(LwesType.NIpAddrArray == 0x92.toByte)
    assert(LwesType.NInt64Array == 0x93.toByte)
    assert(LwesType.NUInt64Array == 0x94.toByte)
    assert(LwesType.NBoolArray == 0x95.toByte)
    assert(LwesType.NByteArray == 0x96.toByte)
    assert(LwesType.NFloatArray == 0x97.toByte)
    assert(LwesType.NDoubleArray == 0x98.toByte)
    (0x8d to 0x98).foreach(t => assert(LwesType.isNullableArray(t.toByte)))
    assert(!LwesType.isNullableArray(0x8c.toByte)) // double[] is classic
    assert(!LwesType.isNullableArray(0x99.toByte))
    assert(LwesType.elementOfNullable(LwesType.NStrArray) == LwesType.Str)
    assert(LwesType.name(LwesType.NInt32Array) == "nullable int32[]")
  }

  test("nullable arrays round-trip every element type with null holes") {
    def box[A](xs: Seq[Any]): Array[AnyRef] =
      xs.map(_.asInstanceOf[AnyRef]).toArray
    val ev = LwesEvent("N::E")
      .setNullableArray("u16", LwesType.UInt16, box(Seq(1, null, 65535)))
      .setNullableArray("i16", LwesType.Int16, box(Seq(null, (-5).toShort)))
      .setNullableArray("u32", LwesType.UInt32, box(Seq(4294967295L, null)))
      .setNullableArray("i32", LwesType.Int32, box(Seq(null, null, 7)))
      .setNullableArray("i64", LwesType.Int64, box(Seq(Long.MinValue, null)))
      .setNullableArray("u64", LwesType.UInt64, box(Seq(null, -1L)))
      .setNullableArray("b", LwesType.Bool, box(Seq(true, null, false)))
      .setNullableArray("by", LwesType.ByteT, box(Seq(null, 9.toByte)))
      .setNullableArray("f", LwesType.Float, box(Seq(1.5f, null)))
      .setNullableArray("d", LwesType.Double, box(Seq(null, 2.25)))
      .setNullableArray("s", LwesType.Str, box(Seq("a", null, "héllo", "")))
      .setNullableArray("ip", LwesType.IpAddr,
        box(Seq(Array[Byte](10, 0, 0, 1), null)))
      // degenerate shapes: empty, all-null, 9-element (2 bitset bytes)
      .setNullableArray("empty", LwesType.Int32, box(Seq.empty))
      .setNullableArray("allnull", LwesType.Str, box(Seq(null, null, null)))
      .setNullableArray("nine", LwesType.Int32,
        box(Seq(1, null, 3, null, 5, null, 7, null, 9)))
    val bytes = LwesCodec.serialize(ev)
    val back = LwesCodec.deserialize(bytes)
    assert(back.get("u16").get.value.asInstanceOf[Array[AnyRef]].toSeq ==
      Seq(1, null, 65535))
    assert(back.get("s").get.value.asInstanceOf[Array[AnyRef]].toSeq ==
      Seq("a", null, "héllo", ""))
    assert(back.get("allnull").get.value.asInstanceOf[Array[AnyRef]].toSeq ==
      Seq(null, null, null))
    assert(back.get("nine").get.value.asInstanceOf[Array[AnyRef]].toSeq ==
      Seq(1, null, 3, null, 5, null, 7, null, 9))
    val ip = back.get("ip").get.value.asInstanceOf[Array[AnyRef]]
    assert(ip(0).asInstanceOf[Array[Byte]].toSeq == Seq(10, 0, 0, 1) &&
      ip(1) == null)
    // byte-stable re-serialization (token + null positions preserved)
    assert(LwesCodec.serialize(back).sameElements(bytes))
  }

  test("nullable-array wire layout: count, bitset BIT count, LSB-first bitset") {
    val ev = LwesEvent("E").setNullableArray("abc", LwesType.Int32,
      Array[AnyRef](java.lang.Integer.valueOf(7), null,
        java.lang.Integer.valueOf(9)))
    val bytes = LwesCodec.serialize(ev)
    // payload: 1B nameLen, "E", u16 attrCount, 1B keyLen, "abc", token,
    // then the value
    val v = 1 + 1 + 2 + 1 + 3
    assert(bytes(v) == LwesType.NInt32Array)
    assert(((bytes(v + 1) & 0xff) << 8 | (bytes(v + 2) & 0xff)) == 3) // count
    // second u16 = bitset capacity in BITS (lwes-java serializeBitSet
    // convention), the reader derives ceil(3/8)=1 byte from it
    assert(((bytes(v + 3) & 0xff) << 8 | (bytes(v + 4) & 0xff)) == 3)
    assert((bytes(v + 5) & 0xff) == 0x05) // bits 0 and 2 set, LSB-first
    // elements: only the two present int32s follow
    assert(bytes.length == v + 6 + 8)
  }

  test("projected parse length-skips unwanted NULLABLE array attrs") {
    val ev = LwesEvent("E")
      .setInt32("a", 1)
      .setNullableArray("holes", LwesType.Int64,
        Array.tabulate[AnyRef](300)(i =>
          if (i % 3 == 0) null else java.lang.Long.valueOf(i.toLong)))
      .setNullableArray("strs", LwesType.Str,
        Array.tabulate[AnyRef](20)(i => if (i % 2 == 0) null else "x" * 40))
      .setInt64("c", 9L)
    val bytes = LwesCodec.serialize(ev)
    val proj = LwesCodec.deserialize(bytes, 0, bytes.length, Set("a", "c"))
    assert(proj.attrs.map(_.key) == Seq("a", "c"))
    assert(proj.get("c").get.value == 9L)
  }

  test("garbage bits above the count in the final bitset byte are tolerated") {
    // lwes-java writes zeros above the capacity; a sloppy emitter might
    // not — reads must honor only bits < count, re-serialize normalized
    val ev = LwesEvent("E").setNullableArray("ab", LwesType.Int32,
      Array[AnyRef](java.lang.Integer.valueOf(7), null,
        java.lang.Integer.valueOf(9)))
    val bytes = LwesCodec.serialize(ev)
    val v = 1 + 1 + 2 + 1 + 2 // nameLen,"E",count,keyLen,"ab"
    val dirty = bytes.clone()
    dirty(v + 5) = (0x05 | 0xf8).toByte // bits 0,2 set + garbage above count
    val back = LwesCodec.deserialize(dirty)
    assert(back.get("ab").get.value.asInstanceOf[Array[AnyRef]].toSeq ==
      Seq(7, null, 9))
    // normalized on re-serialization: clean high bits
    assert(LwesCodec.serialize(back).sameElements(bytes))
  }

  test("a bitset bit-count header that disagrees with the element count is named corruption") {
    val ev = LwesEvent("E").setNullableArray("ab", LwesType.Int32,
      Array.tabulate[AnyRef](9)(i => java.lang.Integer.valueOf(i)))
    val bytes = LwesCodec.serialize(ev)
    val v = 1 + 1 + 2 + 1 + 2 // nameLen,"E",count,keyLen,"ab"
    assert(bytes(v) == LwesType.NInt32Array)
    // a graft<=r17-style BYTE-count header (ceil(9/8)=2 != 9) must fail
    // loudly, never silently swallow element payload as bitset bytes
    bytes(v + 4) = 2
    val e = intercept[IllegalArgumentException](LwesCodec.deserialize(bytes))
    assert(e.getMessage.contains("bitset"))
    // same strictness for an oversized declaration
    bytes(v + 4) = 16
    val e2 = intercept[IllegalArgumentException](LwesCodec.deserialize(bytes))
    assert(e2.getMessage.contains("bitset"))
  }
}
