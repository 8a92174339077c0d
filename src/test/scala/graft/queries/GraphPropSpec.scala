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

  test("q63 pagerank: integer ranks match a sequential reference replay") {
    // north-rule shape for the iterative operator: the distributed
    // join+aggregate rounds must be bit-identical to a single-threaded
    // replay of the same integer recurrence (partitioning independence
    // is inherent — the only cross-partition op is an integer sum).
    val dir = "/root/testdata/sf0.001"
    val got = GraphQueries.q63Pagerank.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    // sequential replay
    val edges = (0L until n).flatMap(src => (1 to 3).map(k =>
      src -> ((src * src * 31L + 7L * k) % n)))
    var rank = Array.fill(n.toInt)(1000000000000L)
    for (_ <- 1 to 3) {
      val in = Array.fill(n.toInt)(0L)
      edges.foreach { case (s, d) => in(d.toInt) += rank(s.toInt) / 3L }
      rank = in.map(x => 150000000000L + (x * 85L) / 100L)
    }
    (0L until n).foreach { i =>
      assert(got(i) == rank(i.toInt), s"rank mismatch at node $i")
    }
    assert(rank.distinct.length > 1, "fixture must produce non-uniform authority")
  }
}
