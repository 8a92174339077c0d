package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level template/boilerplate scrub — the real semantics of the
  * reference's header/footer word removal (split_md_to_pages.py:176-236:
  * a word appearing on ≥40% of a paper's pages is template noise),
  * re-rooted at web hosts: a NORMALIZED LINE appearing on ≥`minPageRatio`
  * of a host's pages is a site-wide template (nav, footer, cookie
  * banner) and is removed from every page of that host. This is the
  * corpus-level quality lever a per-row DOM classifier cannot reach —
  * neutral class names make a footer invisible row-locally, but its
  * cross-page frequency gives it away.
  *
  * Plan shape (all relational, oracle-able):
  *   1. posexplode text into (host, doc, pos, line) — map-only;
  *   2. per-host page counts + per-(host, line) distinct-page counts —
  *      one shuffle on (host, norm), partial-aggregated map-side;
  *   3. frequency filter → the boilerplate set (tiny: templates per
  *      host), joined back LEFT ANTI on (host, norm) — AQE broadcasts
  *      the small side at runtime;
  *   4. ordered reassembly per doc (sort by pos inside collect_list).
  * At 100 TB the wide shuffles key on (host, line-hash) — high
  * cardinality, no hot key beyond a single host's template set.
  */
object TemplateScrub {

  /** Exploded (host, doc, pos, line) view of a corpus. */
  private def lines(df: DataFrame, host: String, docId: String, text: String): DataFrame =
    df.select(col(host).as("h"), col(docId).as("id"),
      posexplode(split(col(text), "\n")).as(Seq("pos", "line")))

  /** The per-host template set: normalized non-empty lines present on at
    * least `minPageRatio` of the host's pages AND on at least two pages —
    * without the absolute floor, a 1–2 page host would classify every
    * unique line as template (1/2 = 0.5 ≥ 0.4) and erase its own prose.
    */
  def boilerplateLines(df: DataFrame, host: String, docId: String, text: String,
                       minPageRatio: Double = 0.4): DataFrame = {
    val l = lines(df, host, docId, text)
    val pages = df.groupBy(col(host).as("h")).agg(countDistinct(col(docId)).as("n_pages"))
    l.filter(length(trim(col("line"))) > 0)
      .select(col("h"), col("id"), trim(col("line")).as("norm"))
      .distinct() // a line counts once per page no matter how often it repeats on it
      .groupBy("h", "norm").agg(count(lit(1)).as("n_on"))
      .join(pages, "h")
      .filter(col("n_on") >= 2 &&
        col("n_on").cast("double") / col("n_pages") >= minPageRatio)
      .select(col("h"), col("norm"), col("n_on"), col("n_pages"))
  }

  /** Remove template lines; returns (h, id, n_kept, cleaned) with the
    * surviving lines rejoined in original order.
    */
  def scrub(df: DataFrame, host: String, docId: String, text: String,
            minPageRatio: Double = 0.4): DataFrame = {
    val l = lines(df, host, docId, text)
    val boiler = boilerplateLines(df, host, docId, text, minPageRatio)
      .select(col("h").as("bh"), col("norm"))
    val kept = l.join(boiler, l("h") === col("bh") && trim(l("line")) === col("norm"), "left_anti")
    val agg = kept.groupBy("h", "id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")),
          "\n").as("cleaned"))
    // a fully-templated page must survive as an empty doc, not vanish
    df.select(col(host).as("h"), col(docId).as("id")).distinct()
      .join(agg, Seq("h", "id"), "left")
      .select(col("h"), col("id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }
}
