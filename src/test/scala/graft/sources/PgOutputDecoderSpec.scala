package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Pure pgoutput-v1 decoder pins — synthetic wire messages, no server.
  * The TOAST rule under test: an unchanged-TOAST cell ('u') may backfill
  * ONLY from a full old image ('O' tuple, REPLICA IDENTITY FULL). A 'K'
  * old tuple (key-changing UPDATE under default replica identity)
  * carries 'n' for every non-key column, so treating it as a fallback
  * would silently null large values — the decoder must refuse loudly
  * instead. */
class PgOutputDecoderSpec extends AnyFunSuite {

  private def cstr(b: java.io.ByteArrayOutputStream, s: String): Unit = {
    b.write(s.getBytes(UTF_8)); b.write(0)
  }

  private def i16(b: java.io.ByteArrayOutputStream, v: Int): Unit =
    b.write(ByteBuffer.allocate(2).putShort(v.toShort).array())

  private def i32(b: java.io.ByteArrayOutputStream, v: Int): Unit =
    b.write(ByteBuffer.allocate(4).putInt(v).array())

  /** Relation message: users(id int8, blob text). */
  private def relMsg(relId: Int): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    b.write('R'); i32(b, relId)
    cstr(b, "public"); cstr(b, "users")
    b.write('d') // replica identity
    i16(b, 2)
    b.write(0); cstr(b, "id"); i32(b, 20); i32(b, -1)
    b.write(0); cstr(b, "blob"); i32(b, 25); i32(b, -1)
    b.toByteArray
  }

  private sealed trait Cell
  private case object N extends Cell
  private case object U extends Cell
  private case class T(s: String) extends Cell

  private def tupleData(b: java.io.ByteArrayOutputStream, cells: Seq[Cell]): Unit = {
    i16(b, cells.size)
    cells.foreach {
      case N => b.write('n')
      case U => b.write('u')
      case T(s) =>
        b.write('t'); val raw = s.getBytes(UTF_8); i32(b, raw.length); b.write(raw)
    }
  }

  private def updateMsg(relId: Int, oldKind: Option[Char],
                        oldCells: Seq[Cell], newCells: Seq[Cell]): Array[Byte] = {
    val b = new java.io.ByteArrayOutputStream()
    b.write('U'); i32(b, relId)
    oldKind.foreach { k => b.write(k); tupleData(b, oldCells) }
    b.write('N'); tupleData(b, newCells)
    b.toByteArray
  }

  private def decoder(relId: Int): PgOutputDecoder = {
    val d = new PgOutputDecoder
    assert(d.decode(1L, relMsg(relId)).isEmpty)
    d
  }

  test("'O' old image backfills unchanged-TOAST cells") {
    val d = decoder(1)
    val out = d.decode(2L, updateMsg(1, Some('O'),
      oldCells = Seq(T("1"), T("BIGVALUE")),
      newCells = Seq(T("1"), U)))
    assert(out.size === 1)
    assert(out.head.contains(""""after":{"id":1,"blob":"BIGVALUE"}"""))
  }

  test("'K' old tuple must NOT backfill: its non-key cells are null markers") {
    val d = decoder(1)
    // key-changing UPDATE under default replica identity: old tuple is
    // key-only (blob cell = 'n'), new tuple's blob is unchanged TOAST.
    // Backfilling from 'K' would emit blob=null — refuse loudly.
    val e = intercept[IllegalStateException](d.decode(2L, updateMsg(1, Some('K'),
      oldCells = Seq(T("1"), N),
      newCells = Seq(T("2"), U))))
    assert(e.getMessage.contains("REPLICA IDENTITY FULL"))
  }

  test("no old tuple with unchanged-TOAST still refuses (default identity, same key)") {
    val d = decoder(1)
    val e = intercept[IllegalStateException](d.decode(2L,
      updateMsg(1, None, Nil, Seq(T("1"), U))))
    assert(e.getMessage.contains("REPLICA IDENTITY FULL"))
  }

  test("'K' old tuple without TOAST cells decodes normally (before = key image)") {
    val d = decoder(1)
    val out = d.decode(2L, updateMsg(1, Some('K'),
      oldCells = Seq(T("1"), N),
      newCells = Seq(T("2"), T("x"))))
    assert(out.size === 1)
    assert(out.head.contains(""""before":{"id":1,"blob":null}"""))
    assert(out.head.contains(""""after":{"id":2,"blob":"x"}"""))
  }
}
