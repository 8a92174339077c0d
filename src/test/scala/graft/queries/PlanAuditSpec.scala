package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** Physical-plan audits: the plans we designed for are the plans
  * Catalyst actually picks (the "explain and iterate" discipline —
  * filters reach the parquet scan, small sides broadcast, anti-joins
  * stay anti, scans prune columns).
  */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q02: filter pushed to parquet scan; columns pruned") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters:") && p.contains("l_quantity"),
      s"expected quantity filter pushed to scan:\n$p")
    // projection needs 5 source columns; the scan must not read the rest
    assert(p.contains("ReadSchema") && !p.contains("l_returnflag"),
      "scan should not read unprojected columns")
  }

  test("q03: dimension joins are broadcast") {
    val p = plan("q03_join_enrich")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast joins:\n$p")
  }

  test("q04: anti-join planned as broadcast/hash anti") {
    val p = plan("q04_antijoin_resume")
    assert(p.contains("LeftAnti"), s"expected LeftAnti join:\n$p")
  }

  test("q23: centroid/query side broadcast in cosine top-k") {
    val p = plan("q23_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"expected broadcast for the small query side:\n$p")
  }

  test("q01: partial aggregation before the shuffle (map-side combine)") {
    val p = plan("q01_pricing_agg")
    assert(p.contains("HashAggregate"), s"expected hash aggregation:\n$p")
    val firstAgg = p.indexOf("HashAggregate")
    assert(p.indexOf("HashAggregate", firstAgg + 1) > 0,
      "expected partial + final aggregate pair")
  }

  test("q21: simhash is a row-local fold — no aggregate, no hash-partition exchange") {
    val p = plan("q21_simhash")
    assert(!p.contains("HashAggregate"), s"simhash must not shuffle-aggregate:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"only the final orderBy range exchange is allowed:\n$p")
  }

  test("q52: window-hash dedup scans the corpus once and partial-aggregates") {
    val p = plan("q52_dup_substrings")
    // the (h, doc_id) compaction must partial-aggregate before its
    // shuffle (map-side combine absorbs within-doc repeats)
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstAgg + 1) > 0,
      s"expected partial + final aggregate pair:\n$p")
    assert(p.contains("Window"), s"expected the count-over-h window:\n$p")
    // single lineage: exactly one text scan feeds the shingle map — a
    // self-join shape would read and extract the whole corpus twice
    val textScans = "ReadSchema: struct<doc_id:bigint,text:string>".r.findAllMatchIn(p).length
    assert(textScans == 1, s"expected ONE text scan, got $textScans:\n$p")
  }

  test("q20: signatures computed once — a single typed map feeding one Generate") {
    val p = plan("q20_lsh_buckets")
    def count(sub: String): Int = sub.r.findAllMatchIn(p).length
    assert(count("SerializeFromObject") == 1,
      s"expected exactly one typed-map stage (signature computed once):\n$p")
    assert(count("Generate ") == 1, s"expected one posexplode Generate:\n$p")
  }

  test("q32: assignment subplan persisted and reused by both join branches") {
    val p = plan("q32_ivf_search")
    assert(p.contains("InMemoryTableScan"),
      s"expected the cached IVF assignment to be reused:\n$p")
  }

  test("q31/q32: IVF cell key has enough distinct values to spread the shuffle") {
    // at sf0.001 k=ceil(sqrt(n)) is small; assert the mechanism at sf0.01
    val df = graft.SparkEntry.queries("q31_embed_neardup")(spark, "/root/testdata/sf0.01")
    val cells = df.select("cell").distinct().count()
    assert(cells >= 16, s"expected >=16 distinct IVF cells at sf0.01, got $cells")
  }

  test("q34: template scrub-back is a left-anti join; line explode is map-only") {
    val p = plan("q34_template_scrub")
    assert(p.contains("LeftAnti"), s"boilerplate removal must be an anti-join:\n$p")
    assert(p.contains("Generate posexplode"), s"line explode must be a Generate:\n$p")
  }

  test("q35: meteor is one typed map stage — no shuffle before the final sort") {
    val p = plan("q35_meteor")
    assert(!p.contains("hashpartitioning"),
      s"meteor is row-local; only the orderBy range exchange is allowed:\n$p")
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      s"expected the typed alignment map:\n$p")
  }

  test("q36: pt2px is a pure projection over a pruned scan") {
    val p = plan("q36_pt2px")
    assert(!p.contains("hashpartitioning"), s"no shuffle expected:\n$p")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      s"scan must read only doc_id:\n$p")
  }

  test("q57: benchmark hashes broadcast; benchmark filter pushed to its scan") {
    // run at sf0.01 — at sf0.001 the %17 slice can be empty
    val p = graft.SparkEntry.queries("q57_decontam")(spark, "/root/testdata/sf0.01")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the benchmark hash set must broadcast (corpus side never shuffles for it):\n$p")
    assert(p.contains("PushedFilters: [IsNotNull(doc_id)]") || p.contains("(doc_id"),
      s"the %17 benchmark slice should filter at/near its scan:\n$p")
  }

  test("q56: PII scrub is map-only — no shuffle before the final sort") {
    val p = plan("q56_pii_scrub")
    assert(!p.contains("HashAggregate") && !p.contains("hashpartitioning"),
      s"the scrub must be a pure projection over the scan:\n$p")
  }

  test("q68: blocklist filter is a broadcast anti-join; rollup partial-aggregates") {
    val p = plan("q68_host_stats")
    assert(p.contains("LeftAnti") && p.contains("Broadcast"),
      s"the host blocklist must broadcast so the corpus never shuffles for the filter:\n$p")
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0 && p.indexOf("HashAggregate", firstAgg + 1) > 0,
      s"expected partial + final aggregate pair for the per-host rollup:\n$p")
  }

  test("q69: the token head broadcasts back to the scoring pass") {
    val p = plan("q69_common_tokens")
    assert(p.contains("BroadcastHashJoin"),
      s"the 8-row head table must broadcast (corpus never shuffles on token for scoring):\n$p")
  }

  test("q70: bigram derivation is map-only and both count tables partial-aggregate") {
    val p = plan("q70_lm_score")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"LM scoring must never go all-pairs:\n$p")
    assert(p.contains("partial_count"),
      s"unigram/bigram counts must combine map-side before their shuffles:\n$p")
  }

  test("q71: canonicalization is pure projection — no joins, one hash shuffle for the verdict") {
    val p = plan("q71_url_canon")
    assert(!p.contains("Join"),
      s"url canonicalization must not join anything:\n$p")
    assert(p.contains("Window"),
      s"keep-first verdict runs as a window over the canonical key:\n$p")
    val hashEx = "hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1, s"expected exactly one hash shuffle (the canon window), got $hashEx:\n$p")
  }

  test("qx_outlinks: link rollup stays in HashAggregate and partial-aggregates map-side") {
    val p = plan("qx_outlinks")
    assert(p.contains("HashAggregate") && !p.contains("SortAggregate"),
      s"all-numeric agg buffers must keep the rollup in HashAggregate:\n$p")
    assert(p.contains("partial_count"),
      s"chrome-link repeats must be absorbed map-side before the href shuffle:\n$p")
  }

  test("extraction scan prunes to url column for the resume anti-join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("plan_audit").toString
    graft.pipeline.ExtractJob.run(spark, "synthetic:50", dir)
    val pages = graft.gen.SyntheticCorpus.generate(spark, 50)
    val done = graft.io.TableIO.readData(spark, dir).get.select("url")
    val p = pages.join(done, Seq("url"), "left_anti").queryExecution.executedPlan.toString
    assert(p.contains("ReadSchema: struct<url:string>"),
      s"resume scan must read only the url column:\n$p")
  }
}
