package graft.bench

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dumps formatted physical plans of representative queries to
  * BENCH/PLANS.md — the "explain and iterate" evidence: predicate
  * pushdown reaching the parquet scan, column pruning, broadcast
  * placement, anti-join shape, whole-stage codegen spans.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val interesting = Seq(
      "q01_pricing_agg" -> "partial→final hash aggregation (map-side combine before the single shuffle)",
      "q02_filter_pushdown" -> "PushedFilters reach the parquet scan; ReadSchema prunes to projected columns",
      "q03_join_enrich" -> "dimension tables broadcast; one shuffle join on the fact key",
      "q04_antijoin_resume" -> "LEFT ANTI join — the resume/skip-if-computed shape",
      "q18_exact_dedup" -> "one shuffle on the content hash (exact dedup)",
      "q23_cosine_topk" -> "query side broadcast; candidates stream map-only into per-query top-k",
      "q25_ivf_assign" -> "centroid side broadcast (IVF assignment, O(n·k) not O(n²))",
      "q20_lsh_buckets" -> "one typed signature map feeding a single posexplode Generate (no recompute)",
      "q21_simhash" -> "row-local aggregate fold — zero Exchange before the final orderBy",
      "q31_embed_neardup" -> "cell-blocked self-join on ceil(sqrt(n)) coarse cells (no label hot-block)",
      "q32_ivf_search" -> "probe-3 IVF cells; assignment subplan persisted and reused (InMemoryTableScan)",
      "q34_template_scrub" -> "posexplode lines map-only; (host,line) shuffle aggregates; LeftAnti scrub-back",
      "q39_ann_recall" -> "distance transform hoisted out of the fold (one sqDist per centroid); persisted assignment shared by the IVF and exact branches",
      "q40_trained_recall" -> "Lloyd-trained spherical codebook; same probe-3 assignment plan as q39",
      "q41_twolevel_assign" -> "two-level quantizer: super-cell routing joins, WindowGroupLimit top-3 over probed cells only",
      "q42_band_claims" -> "simhash bands via one posexplode; first-claim via window min; no embedding-width rows in the shuffle",
      "q35_meteor" -> "one typed alignment map; only the final orderBy exchange",
      "q36_pt2px" -> "pure projection; scan prunes to doc_id",
      "q37_frame_sample" -> "doc→frames flatMap explosion, map-only before the final sort",
      "q44_gopher_rules" -> "one typed map per row (tokenize once — HOFs are interpreted with no CSE); scan prunes to doc_id/text; no shuffle aggregate",
      "q46_top_bigrams" -> "typed bigram flatMap → partial+final hash aggregate → TakeOrderedAndProject top-k (no global sort)",
      "q48_salted_distinct" -> "value-hash salted distinct-count: (k,salt,v) → (k,salt) → (k) shuffle ladder, every stage's hot-key load bounded",
      "q52_dup_substrings" -> "ONE corpus scan/shingle map; (h,doc) partial+final aggregate; count window over h; no self-join",
      "q56_pii_scrub" -> "map-only redaction chain: three codegen'd regexp_replace over the scan, zero shuffles before the final sort",
      "q57_decontam" -> "benchmark %17 slice filtered at its scan, distinct hashes BROADCAST; corpus side resolves contamination map-side before the per-doc rollup",
      "qx_pipe_cat" -> "scan → mapPartitions external worker (no Exchange introduced); one subprocess per partition, not per row",
      "q59_split_sample" -> "stateless map over the scan — split + sample decisions from content-fingerprint arithmetic, zero shuffles before the final sort",
      "q60_mixture" -> "one shuffle on source for the rank window; quota filter local; fp-threshold variant is the skew path",
      "q61_sessions" -> "gaps-and-islands: both window passes AND the session rollup share ONE user_id Exchange",
      "q64_seq_pack" -> "packing window is per-bucket (64 independent partitions — no global order needed to pack); only the final output orderBy is a global sort; typed map computes tokens+fp once",
      "q66_bm25" -> "one tokenize map; 1-row stats aggregate broadcast-cross-joined back; TakeOrderedAndProject top-20 — no postings shuffle",
      "q67_para_dedup" -> "paragraph keep-first via min-position window on the content hash; reassembly is one doc_id shuffle — never all-pairs",
      "qx_outlinks" -> "corpus scan → flatMap DOM walk → partial+final HashAggregate on href (all-numeric buffers, no SortAggregate)",
      "q68_host_stats" -> "blocklist relation BROADCAST into a LeftAnti — the corpus never shuffles for the filter; per-host rollup partial-aggregates",
      "q69_common_tokens" -> "global top-8 token head (TakeOrderedAndProject) broadcast back into the scoring re-scan; corpus never shuffles on token",
      "q70_lm_score" -> "map-only bigram transform (no position self-join); unigram/bigram count tables partial-aggregate; scoring joins on pre-aggregated keys",
      "q71_url_canon" -> "canonicalization is a join-free codegen projection; ONE hash shuffle (keep-first window on canon) before the output sort",
      "q72_link_rank" -> "rank rounds are localCheckpoint-truncated (plan shows the final round over checkpointed RDDs, not an unrolled 4-deep lineage); edges⋈ranks shuffle on the same key; hub skew absorbed by partial aggregation on dst",
      "qx_corpus_assemble" -> "the per-split rollup over the published corpus table (partition-pruned scan, partial+final aggregate); the assembly's own dedup + layout shuffles live in CorpusJob (one content-hash window + one (split,bucket) write shuffle, pinned by CorpusJobSpec)",
      "qx_crawl_ingest" -> "the whole wire-bytes→markdown ingest (WARC parse, HTTP strip, charset sniff, extract) is ONE stateless per-row map over the scan — zero Exchange before the output sort, the 1000-executor crawl shape"
    )
    val sb = new StringBuilder
    sb.append("# Physical plans (generated by graft.bench.PlanDump)\n\n")
    sb.append(s"Input: `$sfDir`. These are the plans the engine was DESIGNED for —\n")
    sb.append("PlanAuditSpec asserts the load-bearing properties in CI.\n")
    interesting.foreach { case (name, why) =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n$why\n\n```\n")
      val plan = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      // the load-bearing shape is in the first levels; an unrolled
      // iterative lineage (q40's Lloyd chain) would be ~600 KB of noise
      val lines = plan.linesIterator.toVector
      if (lines.length <= 150) sb.append(plan)
      else sb.append((lines.take(150) :+
        s"... truncated (${lines.length - 150} more lines)").mkString("\n"))
      sb.append("\n```\n")
    }
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/PLANS.md"), sb.toString)
    println(s"wrote BENCH/PLANS.md (${sb.length} chars)")
    spark.stop()
  }
}
