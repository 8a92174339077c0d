package graft.extract

import org.scalatest.funsuite.AnyFunSuite

/** Frozen end-to-end goldens over the synthetic corpus — the cross-round
  * regression guard for the north rule's byte-identity invariant. If a
  * change here is INTENTIONAL (a deliberate semantics improvement),
  * regenerate the table and say so in the commit message; an accidental
  * diff means the engine stopped being deterministic or changed meaning.
  */
class GoldenSnapshotSpec extends AnyFunSuite {

  private val golden = Seq(
    // (url, rowId, markdown md5, md length, blocks kept, dropped, spans)
    ("https://example.org/plain/00000000", 0L, "e8d236fd0f3efb65ad417056d0560629", 526, 3, 2, 0),
    ("https://example.org/boiler/00000007", 7L, "594b20ab91adb19552956d4905dba41a", 734, 4, 11, 0),
    ("https://example.org/boiler/00000023", 23L, "f51692c7e83eb6a24c4d7557fe4d21f7", 614, 3, 11, 0),
    ("https://example.org/table/00000101", 101L, "555feed831654f908b35d8e9e1984626", 687, 4, 2, 1),
    ("https://example.org/boiler/00000999", 999L, "98fee3c940c4393c9d472856f3f0dac1", 626, 5, 11, 0),
    ("https://example.org/nonlatin/00004242", 4242L, "cd52a3d7f1143259bd492cc2ff7ebffb", 75, 2, 2, 0),
    // round 2: refs (bibliography + inline citations), footnote, repeat
    // (tail truncation), math, lists — every family byte-pinned
    ("https://example.org/refs/00000004", 4L, "f6643de43262a2d2dde9212e4ca09e55", 1113, 4, 2, 13),
    ("https://example.org/refs/00000008", 8L, "5cde5ed75c449efc44faad0bcb62c557", 822, 4, 2, 9),
    ("https://example.org/footnote/00000011", 11L, "eedf13b70c4776d981125ff7789185f3", 159, 2, 2, 1),
    ("https://example.org/repeat/00000015", 15L, "25ec04bbe27bdae46191f3e439dc6d78", 367, 3, 2, 0),
    ("https://example.org/math/00000018", 18L, "09ff8892762460fdd0831acc73c0b300", 439, 4, 2, 2),
    ("https://example.org/lists/00000019", 19L, "97e570b8d1fe5831a4e37771e5ed2ee0", 484, 4, 2, 0)
  )

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("frozen corpus pages extract byte-identically") {
    golden.foreach { case (url, i, hash, len, kept, dropped, nSpans) =>
      val p = graft.gen.SyntheticCorpus.pageFor(42L, i)
      assert(p.url == url, s"corpus generator drifted for row $i")
      val d = Extractor.extract(p.url, p.html)
      withClue(s"row $i ($url):") {
        assert(d.ok)
        assert(d.markdown.length == len)
        assert(md5Hex(d.markdown) == hash)
        assert(d.blocks_kept == kept && d.blocks_dropped == dropped)
        assert(d.spans.length == nSpans)
      }
    }
  }
}
