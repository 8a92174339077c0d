package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** The two IVF assignment paths must agree bit-for-bit: the broadcast
  * one-row codebook (k ≤ MaxBroadcastCells) and the centroid-table plan
  * that takes over past the cap. Forcing cap = 1 routes the same input
  * through the table path; (home, probes) must match the broadcast path
  * on every vector.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("table-path assignment (k forced above the broadcast cap) matches the broadcast path") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val viaBroadcast = Similarity.assignedDf(e) // k = ceil(sqrt(n)) <= cap
      .select("vec_id", "home", "probes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).sortBy(_._1)
    val viaTable = Similarity.assignedDf(e, cap = 1L) // same k, table plan
      .select("vec_id", "home", "probes").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2))).sortBy(_._1)
    assert(viaTable.length == viaBroadcast.length && viaTable.length > 0)
    viaBroadcast.zip(viaTable).foreach { case (b, t) =>
      assert(b == t, s"assignment diverged between paths at vec_id ${b._1}: broadcast=$b table=$t")
    }
  }

  test("table path plans a WindowGroupLimit so top-3 prunes before the exchange") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val k = math.ceil(math.sqrt(e.count().toDouble)).toLong
    val p = Similarity.assignedViaTable(e, k).queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), s"expected rank-limit pushdown:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin"), s"centroid table should broadcast:\n$p")
  }
}
