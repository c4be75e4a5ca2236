package graft.lwes

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class JournalSpec extends AnyFunSuite {

  private def mkEvents(n: Int): Seq[LwesEvent] = (0 until n).map { i =>
    LwesEvent(if (i % 3 == 0) "Ad::Click" else "Ad::View")
      .setInt64("id", i.toLong)
      .setString("page", s"/p/$i")
      .setInt32("score", i * 10)
      .setBool("bot", i % 7 == 0)
      .setInt64(LwesEvent.ReceiptTime, 1700000000000L + i)
      .setIpAddr(LwesEvent.SenderIp, Array(10, 0, (i / 256).toByte, (i % 256).toByte))
      .setUInt16(LwesEvent.SenderPort, 9000 + (i % 100))
      .setUInt16(LwesEvent.SiteId, i % 5)
  }

  test("gzip journal round-trip preserves events and header fields") {
    val dir = Files.createTempDirectory("journal").toFile
    val path = s"$dir/part-0.gz"
    val events = mkEvents(500)
    val w = JournalWriter.create(path)
    events.foreach(w.write)
    w.close()

    val r = JournalReader.open(path)
    val back = r.iterator.toVector
    r.close()
    assert(back.size == 500)
    back.zip(events).foreach { case (b, e) =>
      assert(b.name == e.name)
      assert(b.get("id").get.value == e.get("id").get.value)
      assert(b.get("page").get.value == e.get("page").get.value)
      assert(b.get(LwesEvent.ReceiptTime).get.value == e.get(LwesEvent.ReceiptTime).get.value)
      assert(b.get(LwesEvent.SenderPort).get.value == e.get(LwesEvent.SenderPort).get.value)
      assert(b.get(LwesEvent.SiteId).get.value == e.get(LwesEvent.SiteId).get.value)
      assert(LwesEvent.ipToString(b.get(LwesEvent.SenderIp).get.value.asInstanceOf[Array[Byte]])
        == LwesEvent.ipToString(e.get(LwesEvent.SenderIp).get.value.asInstanceOf[Array[Byte]]))
    }
  }

  test("plain (uncompressed) journal round-trip") {
    val dir = Files.createTempDirectory("journal").toFile
    val path = s"$dir/part-0.journal"
    val events = mkEvents(50)
    val w = JournalWriter.create(path)
    events.foreach(w.write)
    w.close()
    val r = JournalReader.open(path)
    assert(r.iterator.size == 50)
    r.close()
  }

  test("event-name filter skips foreign events without parsing") {
    val dir = Files.createTempDirectory("journal").toFile
    val path = s"$dir/mixed.gz"
    val w = JournalWriter.create(path)
    mkEvents(300).foreach(w.write)
    w.close()
    val r = JournalReader.open(path, eventNameFilter = _ == "Ad::Click")
    val clicks = r.iterator.toVector
    r.close()
    assert(clicks.size == 100)
    assert(clicks.forall(_.name == "Ad::Click"))
  }

  test("projected read keeps only wanted attrs (plus wanted header attrs)") {
    val dir = Files.createTempDirectory("journal").toFile
    val path = s"$dir/proj.gz"
    val w = JournalWriter.create(path)
    mkEvents(10).foreach(w.write)
    w.close()
    val wanted = Set("id", LwesEvent.SiteId)
    val r = JournalReader.open(path, wanted = wanted)
    val evs = r.iterator.toVector
    r.close()
    assert(evs.forall(_.attrs.map(_.key).toSet == wanted))
  }

  test("header fields on events missing them default to zeros") {
    val dir = Files.createTempDirectory("journal").toFile
    val path = s"$dir/nohdr.gz"
    val w = JournalWriter.create(path)
    w.write(LwesEvent("Bare").setInt32("x", 1))
    w.close()
    val r = JournalReader.open(path)
    val ev = r.iterator.next()
    r.close()
    assert(ev.get(LwesEvent.ReceiptTime).get.value == 0L)
    assert(ev.get(LwesEvent.SenderPort).get.value == 0)
    assert(LwesEvent.ipToString(ev.get(LwesEvent.SenderIp).get.value.asInstanceOf[Array[Byte]]) == "0.0.0.0")
  }
}
