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

  test("resize stub rewrites geometry, preserves payload") {
    import graft.queries.MultiModal._
    val blob = fakeMediaBlob(7L, "payload text")
    val r = resizeStub(blob, 320, 240)
    val m = decodeStub(7L, r)
    assert(m.decode_ok && m.width == 320 && m.height == 240)
    // payload untouched
    assert(java.util.Arrays.equals(
      java.util.Arrays.copyOfRange(blob, 12, blob.length),
      java.util.Arrays.copyOfRange(r, 12, r.length)))
    // garbage in, garbage out (no throw)
    assert(resizeStub(Array[Byte](1, 2), 10, 10).length == 2)
  }

  test("frame sampler explodes every k-th frame, isolates bad blobs") {
    import graft.queries.MultiModal._
    val blob = fakeMediaBlob(12L, "x") // frames = 1 + 12 % 30 = 13
    assert(sampleFrames(12L, blob, 5).map(_._2) == Seq(0, 5, 10))
    assert(sampleFrames(12L, Array[Byte](9), 5).isEmpty)
    assert(sampleFrames(12L, blob, 0).isEmpty)
  }
}
