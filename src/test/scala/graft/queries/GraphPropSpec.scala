package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkTestSession

/** Property evidence for the large-star/small-star components beyond the
  * fixed fixtures: on random graphs the star output must equal a
  * brute-force union-find's min-labeled components exactly.
  */
class GraphPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def check(p: Prop, n: Int): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(n)
      .withInitialSeed(org.scalacheck.rng.Seed(11L))
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the min root (union by min keeps roots minimal)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("property: star components equal brute-force union-find on random graphs") {
    import spark.implicits._
    val edgeGen = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(0, 30)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0, n - 1); b <- Gen.choose(0, n - 1)
      } yield (a.toLong, b.toLong))
    } yield (n, es)
    // few iterations: each runs a full iterative Spark job
    check(Prop.forAll(edgeGen) { case (n, es) =>
      val stars = Dedup.connectedComponents(es.toDF("id1", "id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toMap
      val expect = unionFind(n, es)
      (0L until n.toLong).forall { i =>
        stars.getOrElse(i, i) == expect(i) // absent ⟹ root/isolated ⟹ self
      }
    }, n = 12)
  }
}
