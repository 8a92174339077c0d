package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the embeddings table: brute-force cosine top-k
  * (the exactness baseline) and the IVF building blocks (centroids +
  * nearest-centroid assignment) as the scale path. Dot products are
  * ordered left-folds (`zip_with` + `aggregate`), ranking keys are
  * rounded, and distances go through exact decimals — so the DuckDB
  * oracle matches bit-for-bit.
  *
  * Scale notes: the query side of top-k is broadcast (small), candidates
  * stream map-only into a per-query top-k window; IVF assignment is a
  * broadcast join against the centroid set, turning O(n²) search into
  * O(n·k) — the standard ANN partitioning trade.
  */
object Similarity {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  val q23CosineTopk = QueryDef(
    "q23_cosine_topk",
    (s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      val q = e.filter(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val c = e.filter(col("vec_id") >= 5).select(col("vec_id").as("cid"), col("embedding").as("ce"))
      val sim = dot(col("qe"), col("ce")) /
        (sqrt(dot(col("qe"), col("qe"))) * sqrt(dot(col("ce"), col("ce"))))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim6").desc, col("cid").asc)
      c.join(broadcast(q))
        .withColumn("sim6", round(sim, 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("qid", "rk", "cid", "sim6")
        .orderBy("qid", "rk")
    },
    Some("""
      WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 5),
      p AS (SELECT qid, cid,
        list_sum(list_transform(generate_series(1, len(qe)), i -> CAST(qe[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) AS dp,
        list_sum(list_transform(generate_series(1, len(qe)), i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE))) AS nq,
        list_sum(list_transform(generate_series(1, len(ce)), i -> CAST(ce[i] AS DOUBLE) * CAST(ce[i] AS DOUBLE))) AS nc
        FROM q, c),
      r AS (SELECT qid, cid, round(dp / (sqrt(nq) * sqrt(nc)), 6) AS sim6,
                   row_number() OVER (PARTITION BY qid
                     ORDER BY round(dp / (sqrt(nq) * sqrt(nc)), 6) DESC, cid ASC) AS rk
            FROM p)
      SELECT qid, CAST(rk AS INT) AS rk, cid, sim6 FROM r WHERE rk <= 3 ORDER BY qid, rk
    """.trim)
  )

  /** Per-label centroids (the IVF coarse quantizer training step):
    * exact decimal mean per dimension.
    */
  val q24Centroids = QueryDef(
    "q24_centroids",
    (s, dir) =>
      s.read.parquet(s"$dir/embeddings.parquet")
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
        .select(col("label"), (col("pos0") + 1).as("pos"),
          round(col("v").cast("double"), 6).cast("decimal(9,6)").as("r6"))
        .groupBy("label", "pos")
        .agg((sum(col("r6")).cast("double") / count(lit(1))).as("centroid"))
        .orderBy("label", "pos"),
    Some("""
      WITH x AS (SELECT label,
                        unnest(generate_series(1, len(embedding))) AS pos,
                        unnest(embedding) AS v
                 FROM embeddings)
      SELECT label, CAST(pos AS INT) AS pos,
             CAST(sum(CAST(round(CAST(v AS DOUBLE), 6) AS DECIMAL(9,6))) AS DOUBLE) / count(*) AS centroid
      FROM x GROUP BY label, pos ORDER BY label, pos
    """.trim)
  )

  /** IVF assignment: nearest of 4 probe centroids (vec_id 0..3) by exact
    * decimal squared L2 — broadcastable small side, deterministic argmin.
    */
  val q25IvfAssign = QueryDef(
    "q25_ivf_assign",
    (s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      def expl(df: org.apache.spark.sql.DataFrame, idName: String) =
        df.select(col("vec_id").as(idName), posexplode(col("embedding")).as(Seq("pos0", "v")))
          .select(col(idName), (col("pos0") + 1).as("pos"),
            round(col("v").cast("double"), 6).cast("decimal(9,6)").as("x"))
      val v = expl(e.filter(col("vec_id") >= 4), "vid").withColumnRenamed("x", "vx")
      val c = broadcast(expl(e.filter(col("vec_id") < 4), "cid").withColumnRenamed("x", "cx"))
      val d = v.join(c, "pos")
        .groupBy("vid", "cid")
        .agg(sum((col("vx") - col("cx")) * (col("vx") - col("cx"))).as("d2"))
      val w = Window.partitionBy(col("vid")).orderBy(col("d2").asc, col("cid").asc)
      d.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("vid"), col("cid"), col("d2").cast("double").as("dist2"))
        .orderBy("vid")
    },
    Some("""
      WITH u AS (SELECT vec_id,
                        unnest(generate_series(1, len(embedding))) AS pos,
                        unnest(embedding) AS v0
                 FROM embeddings),
      v AS (SELECT vec_id AS vid, pos,
                   CAST(round(CAST(v0 AS DOUBLE), 6) AS DECIMAL(9,6)) AS x
            FROM u WHERE vec_id >= 4),
      c AS (SELECT vec_id AS cid, pos,
                   CAST(round(CAST(v0 AS DOUBLE), 6) AS DECIMAL(9,6)) AS x
            FROM u WHERE vec_id < 4),
      d AS (SELECT vid, cid, sum((v.x - c.x) * (v.x - c.x)) AS d2
            FROM v JOIN c ON v.pos = c.pos GROUP BY vid, cid),
      a AS (SELECT vid, cid, CAST(d2 AS DOUBLE) AS dist2,
                   row_number() OVER (PARTITION BY vid ORDER BY d2 ASC, cid ASC) AS rk
            FROM d)
      SELECT vid, cid, dist2 FROM a WHERE rk = 1 ORDER BY vid
    """.trim)
  )

  /** Embedding-cosine near-duplicate detection, blocked by label (the
    * IVF-style candidate restriction): the most-similar pair within each
    * label bucket — O(Σ b²) instead of O(n²) over the corpus.
    */
  val q31EmbedNeardup = QueryDef(
    "q31_embed_neardup",
    (s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      // norms hoisted BEFORE the join: the exchange materializes them
      // once per vector instead of once per candidate pair
      val a = e.select(col("label"), col("vec_id").as("v1"), col("embedding").as("e1"),
        sqrt(dot(col("embedding"), col("embedding"))).as("n1"))
      val b = e.select(col("label"), col("vec_id").as("v2"), col("embedding").as("e2"),
        sqrt(dot(col("embedding"), col("embedding"))).as("n2"))
      val cos = dot(col("e1"), col("e2")) / (col("n1") * col("n2"))
      val w = Window.partitionBy(col("label")).orderBy(col("cos6").desc, col("v1").asc, col("v2").asc)
      a.join(b, Seq("label")).filter(col("v1") < col("v2"))
        .withColumn("cos6", round(cos, 6))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("label", "rk", "v1", "v2", "cos6")
        .orderBy("label", "rk")
    },
    Some("""
      WITH p AS (
        SELECT a.label, a.vec_id AS v1, b.vec_id AS v2,
          round(
            list_sum(list_transform(generate_series(1, len(a.embedding)),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) /
            (sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)))) *
             sqrt(list_sum(list_transform(generate_series(1, len(b.embedding)),
              i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))), 6) AS cos6
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id),
      r AS (SELECT label, v1, v2, cos6,
                   row_number() OVER (PARTITION BY label ORDER BY cos6 DESC, v1 ASC, v2 ASC) AS rk
            FROM p)
      SELECT label, CAST(rk AS INT) AS rk, v1, v2, cos6 FROM r WHERE rk <= 3
      ORDER BY label, rk
    """.trim)
  )

  /** IVF-routed ANN: assign every vector to its nearest probe centroid
    * (q25), then answer nearest-neighbor queries ONLY within the same
    * cell — the scale path that makes 10^12-row ANN tractable.
    */
  val q32IvfSearch = QueryDef(
    "q32_ivf_search",
    (s, dir) => {
      val e = s.read.parquet(s"$dir/embeddings.parquet")
      def assigned = {
        def expl(df: org.apache.spark.sql.DataFrame, idName: String) =
          df.select(col("vec_id").as(idName), posexplode(col("embedding")).as(Seq("pos0", "v")))
            .select(col(idName), (col("pos0") + 1).as("pos"),
              round(col("v").cast("double"), 6).cast("decimal(9,6)").as("x"))
        val v = expl(e.filter(col("vec_id") >= 4), "vid").withColumnRenamed("x", "vx")
        val c = broadcast(expl(e.filter(col("vec_id") < 4), "cid").withColumnRenamed("x", "cx"))
        val d = v.join(c, "pos").groupBy("vid", "cid")
          .agg(sum((col("vx") - col("cx")) * (col("vx") - col("cx"))).as("d2"))
        val w = Window.partitionBy(col("vid")).orderBy(col("d2").asc, col("cid").asc)
        d.withColumn("rk", row_number().over(w)).filter(col("rk") === 1).select("vid", "cid")
      }
      val cells = assigned
      val emb = e.select(col("vec_id"), col("embedding"))
      val qs = cells.filter(col("vid") % 100 === 4) // a deterministic query subset
        .join(emb, cells("vid") === emb("vec_id"))
        .select(col("vid").as("qid"), col("cid").as("qcell"), col("embedding").as("qe"),
          sqrt(dot(col("embedding"), col("embedding"))).as("qn"))
      val cands = cells.join(emb, cells("vid") === emb("vec_id"))
        .select(col("vid").as("nid"), col("cid").as("ncell"), col("embedding").as("ne"),
          sqrt(dot(col("embedding"), col("embedding"))).as("nn"))
      val cos = dot(col("qe"), col("ne")) / (col("qn") * col("nn"))
      val w2 = Window.partitionBy(col("qid")).orderBy(col("cos6").desc, col("nid").asc)
      qs.join(cands, col("qcell") === col("ncell") && col("qid") =!= col("nid"))
        .withColumn("cos6", round(cos, 6))
        .withColumn("rk", row_number().over(w2))
        .filter(col("rk") === 1)
        .select(col("qid"), col("qcell").as("cell"), col("nid"), col("cos6"))
        .orderBy("qid")
    },
    Some("""
      WITH u AS (SELECT vec_id,
                        unnest(generate_series(1, len(embedding))) AS pos,
                        unnest(embedding) AS v0
                 FROM embeddings),
      vv AS (SELECT vec_id AS vid, pos, CAST(round(CAST(v0 AS DOUBLE), 6) AS DECIMAL(9,6)) AS x
             FROM u WHERE vec_id >= 4),
      cc AS (SELECT vec_id AS cid, pos, CAST(round(CAST(v0 AS DOUBLE), 6) AS DECIMAL(9,6)) AS x
             FROM u WHERE vec_id < 4),
      d AS (SELECT vid, cid, sum((vv.x - cc.x) * (vv.x - cc.x)) AS d2
            FROM vv JOIN cc ON vv.pos = cc.pos GROUP BY vid, cid),
      cells AS (SELECT vid, cid FROM (
        SELECT vid, cid, row_number() OVER (PARTITION BY vid ORDER BY d2 ASC, cid ASC) AS rk
        FROM d) t WHERE rk = 1),
      qs AS (SELECT c.vid AS qid, c.cid AS qcell, e.embedding AS qe
             FROM cells c JOIN embeddings e ON c.vid = e.vec_id WHERE c.vid % 100 = 4),
      cands AS (SELECT c.vid AS nid, c.cid AS ncell, e.embedding AS ne
                FROM cells c JOIN embeddings e ON c.vid = e.vec_id),
      p AS (SELECT qid, qcell, nid,
          round(
            list_sum(list_transform(generate_series(1, len(qe)), i -> CAST(qe[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE))) /
            (sqrt(list_sum(list_transform(generate_series(1, len(qe)), i -> CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)))) *
             sqrt(list_sum(list_transform(generate_series(1, len(ne)), i -> CAST(ne[i] AS DOUBLE) * CAST(ne[i] AS DOUBLE))))), 6) AS cos6
        FROM qs JOIN cands ON qcell = ncell AND qid <> nid)
      SELECT qid, qcell AS cell, nid, cos6 FROM (
        SELECT qid, qcell, nid, cos6,
               row_number() OVER (PARTITION BY qid ORDER BY cos6 DESC, nid ASC) AS rk
        FROM p) t WHERE rk = 1 ORDER BY qid
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(
    q23CosineTopk, q24Centroids, q25IvfAssign, q31EmbedNeardup, q32IvfSearch)
}
