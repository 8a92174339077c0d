package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Large-star/small-star connected components: round count must be
  * log²-bounded, not diameter-bounded — the exact failure mode of the
  * old min-label propagation (≤64 rounds) was a long duplicate chain.
  */
class DedupCcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("path graph with diameter 99 converges to a single min-rooted component") {
    // 0-1-2-...-99: worst case for propagation (needs 99 rounds there)
    val pairs = (0L until 99L).map(i => (i, i + 1)).toDF("id1", "id2")
    val stars = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 99L).forall(i => stars(i) == 0L),
      s"every member must root at 0, got: ${stars.toSeq.sorted.take(10)}...")
    assert(!stars.contains(0L), "the root carries no star edge")
  }

  test("multiple components, shuffled edge directions, and isolated nodes") {
    val pairs = Seq(
      (5L, 3L), (3L, 7L), (7L, 9L),          // component rooted at 3
      (20L, 25L), (25L, 21L),                // component rooted at 20
      (40L, 40L)                             // self-loop: no edge at all
    ).toDF("id1", "id2")
    val stars = Dedup.connectedComponents(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(stars == Map(5L -> 3L, 7L -> 3L, 9L -> 3L, 21L -> 20L, 25L -> 20L))
  }

  test("empty edge set yields no star edges") {
    val pairs = Seq.empty[(Long, Long)].toDF("id1", "id2")
    assert(Dedup.connectedComponents(pairs).count() == 0L)
  }
}
