package graft.queries

import org.scalatest.funsuite.AnyFunSuite

class MultiModalSpec extends AnyFunSuite {
  import MultiModal._

  test("blob header round-trips through decode stub") {
    val m = decodeStub(42L, fakeMediaBlob(42L, "hello world"))
    assert(m.decode_ok)
    assert(m.width == 64 + 42 && m.height == 48 + (42 * 7 % 432) && m.frames == 1 + 42 % 30)
    assert(m.bytes == 12 + "hello world".getBytes("UTF-8").length)
    assert(m.feature.length == 8)
  }

  test("garbage blob is isolated, not thrown") {
    assert(!decodeStub(1L, Array[Byte](1, 2, 3)).decode_ok)
    assert(!decodeStub(1L, null).decode_ok)
    assert(!decodeStub(1L, "XXinvalid-header-bytes".getBytes("UTF-8")).decode_ok)
  }

  test("features deterministic") {
    val a = decodeStub(7L, fakeMediaBlob(7L, "abc def"))
    val b = decodeStub(7L, fakeMediaBlob(7L, "abc def"))
    assert(a.feature.toSeq == b.feature.toSeq)
  }
}
