package graft.bench

/** Scratch micro-benchmark for PageAligner (not part of the contract). */
object AlignProbe {
  def main(args: Array[String]): Unit = {
    val nWords = args.lift(0).map(_.toInt).getOrElse(300)
    val reps = args.lift(1).map(_.toInt).getOrElse(200)
    val rnd = new scala.util.Random(7)
    val vocab = Vector("data", "spark", "query", "table", "model", "method",
      "result", "value", "line", "page", "study", "work", "fast", "slow")
    def mkDoc(): IndexedSeq[String] = {
      val words = IndexedSeq.fill(nWords)(vocab(rnd.nextInt(vocab.length)))
      words.grouped(8).map(_.mkString(" ")).toIndexedSeq
    }
    def alignOnce(): Double = {
      val paras = mkDoc()
      val perPage = math.max(1, (paras.length + 2) / 3)
      val pages = paras.grouped(perPage).map(_.toIndexedSeq).toIndexedSeq
      val doc = paras.zipWithIndex.map { case (p, i) =>
        if (i % 2 == 1) p.replaceFirst("^(\\S+)", "**$1**") else p
      }
      val t0 = System.nanoTime()
      graft.align.PageAligner.align(pages, doc)
      (System.nanoTime() - t0) / 1e6
    }
    (1 to 50).foreach(_ => alignOnce()) // warm
    val times = (1 to reps).map(_ => alignOnce())
    println(f"per-align: median ${times.sorted.apply(reps / 2)}%.2f ms  " +
      f"mean ${times.sum / reps}%.2f ms  max ${times.max}%.2f ms")
  }
}
