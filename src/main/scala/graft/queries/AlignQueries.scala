package graft.queries

import org.apache.spark.sql.functions._
import graft.align.{PageAligner, Staircase}

/** Page-alignment operators (W1 staircase, W2 BoW labels, J8 fuzzy
  * refinement) exposed through the driver contract. The algorithms are
  * iterative per-document fits with no SQL form, so these run rows-only
  * in CORRECTNESS; exactness is pinned by the reference-golden
  * StaircaseSpec (23 streams) and AlignSpec.
  *
  * Scale shape: both queries are one shuffle (groupBy key) followed by a
  * row-local fit per group — the per-document state never leaves its
  * task, so the plan is a single Exchange + mapGroups at any corpus
  * size.
  */
object AlignQueries {

  private val pFirstWord = java.util.regex.Pattern.compile("^(\\S+)")

  /** Staircase fit over deterministic noisy label streams derived from
    * the events table: each user's ordered event stream gets a monotone
    * page signal with hash-seeded label noise; the fit must recover
    * monotone boundaries.
    */
  val qxStaircase = QueryDef(
    "qx_staircase",
    (s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/events.parquet")
        // ts is TIMESTAMP_NTZ: go through LTZ (session tz is UTC) to
        // get a sortable epoch long under ANSI
        .select(col("user_id"), col("ts").cast("timestamp_ltz").cast("long").as("tsl"),
          col("event_id"), col("event_type"))
        .as[(Long, Long, Long, String)]
        .groupByKey(_._1)
        .mapGroups { (uid, it) =>
          val evs = it.toArray.sortBy(e => (e._2, e._3))
          val n = evs.length
          val classes = math.max(2, math.min(6, n / 12))
          val labels = Array.tabulate(n) { i =>
            val base = (i.toLong * classes / n).toInt
            val h = evs(i)._4.hashCode
            val noisy =
              if (((h % 7) + 7) % 7 == 0) base + (if ((h & 1) == 0) 1 else -1)
              else base
            math.max(0, math.min(classes - 1, noisy))
          }
          val fit = Staircase.fit(labels, classes)
          val preds = labels.indices.map(fit.predict)
          (uid, n, classes, fit.boundaries.mkString(","),
            fit.boundaries.length, preds.distinct.length,
            preds == preds.sorted) // monotonicity witness
        }
        .toDF("user_id", "n_events", "n_classes", "boundaries",
          "n_boundaries", "n_pages_used", "monotone")
        .orderBy("user_id")
    },
    None
  )

  /** End-to-end alignment: chunk each document's tokens into synthetic
    * "pages" of paragraphs, decorate the doc-side copy with markdown
    * noise (bold/emphasis) that the projection must see through, then
    * recover the page splits.
    */
  val qxPageAlign = QueryDef(
    "qx_page_align",
    (s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          val words = text.trim.split("\\s+")
          val paras = words.grouped(8).map(_.mkString(" ")).toIndexedSeq
          val perPage = math.max(1, (paras.length + 2) / 3)
          val pages = paras.grouped(perPage).map(_.toIndexedSeq).toIndexedSeq
          // doc-side copy with markup noise: bold the first word of
          // every other paragraph — removeSpecialChars must see through
          val doc = paras.zipWithIndex.map { case (p, i) =>
            if (i % 2 == 1) pFirstWord.matcher(p).replaceFirst("**$1**") else p
          }
          val a = PageAligner.align(pages, doc)
          val expected = pages.indices.map(i => i * perPage)
          val hits = a.splits.zip(expected).count { case (sp, e) => sp.paragraph == e }
          (id, pages.length, a.splits.map(_.paragraph).mkString(","),
            hits, f"${a.splits.map(_.score).min}%.4f")
        })
        .toDF("doc_id", "n_pages", "split_paragraphs", "exact_hits", "min_score")
        .orderBy("doc_id")
    },
    None
  )

  val all: Seq[QueryDef] = Seq(qxStaircase, qxPageAlign)
}
