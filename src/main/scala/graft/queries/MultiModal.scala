package graft.queries

import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride as opaque BINARY
  * columns with typed metadata; decode/feature-extract runs batched in
  * mapPartitions. The actual codec is a clearly-marked deterministic
  * STUB (no image/audio libraries in this container) — the Spark-side
  * contract (schema, batching, partitioning, failure isolation) is real
  * and tested.
  */
object MultiModal {

  /** Fake media blob: 12-byte header (magic "GM", version, width, height,
    * frames) + payload bytes. Deterministic from the text payload.
    */
  def fakeMediaBlob(docId: Long, text: String): Array[Byte] = {
    val payload = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
    bb.put('G'.toByte).put('M'.toByte)
    bb.putShort(1.toShort)
    bb.putShort((64 + (docId % 512)).toShort)  // width
    bb.putShort((48 + (docId * 7 % 432)).toShort) // height
    bb.putInt((1 + docId % 30).toInt)          // frame count
    bb.put(payload)
    bb.array()
  }

  final case class MediaMeta(doc_id: Long, width: Int, height: Int, frames: Int,
                             bytes: Int, feature: Array[Float], decode_ok: Boolean)

  /** STUB decoder: parses the header and emits a deterministic 8-dim
    * "feature" from byte statistics. A real deployment swaps the body
    * for an actual codec; the signature and batch shape stay.
    */
  def decodeStub(docId: Long, blob: Array[Byte]): MediaMeta = {
    if (blob == null || blob.length < 12 || blob(0) != 'G'.toByte || blob(1) != 'M'.toByte)
      return MediaMeta(docId, 0, 0, 0, if (blob == null) 0 else blob.length,
        Array.fill(8)(0f), decode_ok = false)
    val bb = java.nio.ByteBuffer.wrap(blob)
    bb.getShort() // skip magic
    bb.getShort() // version
    val w = bb.getShort().toInt
    val h = bb.getShort().toInt
    val f = bb.getInt()
    // ??? real pixel decode goes here; deterministic fake features
    // instead — per-lane INTEGER byte sums divided once (engine-
    // agnostic arithmetic: an order-sensitive per-byte float32
    // accumulation could not be replayed exactly in SQL, and a real
    // codec replaces this body wholesale anyway):
    val lane = new Array[Long](8)
    var i = 12
    while (i < blob.length) {
      lane((i - 12) % 8) += (blob(i) & 0xff)
      i += 1
    }
    val feat = Array.tabulate(8)(l => (lane(l) / 255.0).toFloat)
    MediaMeta(docId, w, h, f, blob.length, feat, decode_ok = true)
  }

  /** STUB resize: recomputes the header for the target geometry and
    * re-emits the payload untouched (a real codec would resample pixels;
    * the Spark-side contract — pure function of (blob, w, h), new header,
    * deterministic output — is what downstream stages depend on).
    */
  def resizeStub(blob: Array[Byte], width: Int, height: Int): Array[Byte] = {
    if (blob == null) return Array.empty
    val out = java.util.Arrays.copyOf(blob, blob.length) // never alias the input
    if (out.length < 12) return out
    val bb = java.nio.ByteBuffer.wrap(out)
    bb.putShort(4, width.toShort)
    bb.putShort(6, height.toShort)
    out
  }

  /** Header-only frame count (no payload scan — the full decodeStub walks
    * every payload byte for features this caller discards). -1 = bad blob. */
  def frameCount(blob: Array[Byte]): Int = {
    if (blob == null || blob.length < 12 || blob(0) != 'G'.toByte || blob(1) != 'M'.toByte)
      return -1
    java.nio.ByteBuffer.wrap(blob).getInt(8)
  }

  /** STUB frame sampler: every k-th frame index of a media blob (the
    * rasterize/frame-extract batch shape — one input row explodes into
    * bounded frame rows; a real codec would decode each frame's pixels).
    */
  def sampleFrames(docId: Long, blob: Array[Byte], everyK: Int): Seq[(Long, Int)] = {
    val frames = frameCount(blob)
    if (frames < 0 || everyK <= 0) Seq.empty
    else (0 until frames by everyK).map(f => (docId, f))
  }

  /** Binary metadata projection with a DuckDB oracle: byte length and
    * content hash of the BINARY column plus arithmetic "header" fields.
    */
  val q26BinaryMeta = QueryDef(
    "q26_binary_meta",
    (s, dir) => {
      val b = to_binary(col("text"), lit("utf-8"))
      s.read.parquet(s"$dir/documents.parquet")
        .select(
          col("doc_id"),
          octet_length(b).as("n_bytes"),
          md5(b).as("content_md5"),
          (pmod(col("doc_id"), lit(512)) + 64).as("width"),
          (pmod(col("doc_id") * 7, lit(432)) + 48).as("height"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS INT) AS n_bytes,
             md5(text) AS content_md5,
             (doc_id % 512) + 64 AS width,
             ((doc_id * 7) % 432) + 48 AS height
      FROM documents ORDER BY doc_id
    """.trim)
  )

  /** Full binary round-trip through the stub codec in mapPartitions,
    * under the oracle gate: DuckDB rebuilds the header fields and the
    * lane-sum features arithmetically from the text payload (1 byte
    * per char — the corpus is ASCII, the same contract boundary
    * qx_extract_spans documents), so the blob framing, resize header
    * rewrite, decode walk, and feature arithmetic are all replayed
    * bit-exactly. The final 8-lane sum folds in lane order through
    * doubles on both engines.
    */
  val qxMediaFeatures = QueryDef(
    "qx_media_features",
    (s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.map { case (id, text) =>
          // decode → resize → re-decode: exercises the full stub chain
          // (a real deployment resamples pixels between the two decodes)
          val resized = resizeStub(fakeMediaBlob(id, text), 224, 224)
          decodeStub(id, resized)
        })
        .select(col("doc_id"), col("width"), col("height"), col("frames"),
          col("bytes"), col("decode_ok"),
          round(aggregate(col("feature"), lit(0.0), (a, x) => a + x.cast("double")), 4).as("feat_sum"))
        .orderBy("doc_id")
    },
    Some("""
      WITH lanes AS (
        SELECT doc_id, (t.j - 1) % 8 AS lane,
               sum(unicode(substring(text, CAST(t.j AS INT), 1))) AS s
        FROM documents, unnest(generate_series(1, len(text))) AS t(j)
        GROUP BY doc_id, (t.j - 1) % 8),
      feats AS (SELECT doc_id,
                       list(CAST(CAST(s / 255.0 AS REAL) AS DOUBLE) ORDER BY lane) AS fl
                FROM lanes GROUP BY doc_id)
      SELECT d.doc_id,
             224 AS width, 224 AS height,
             CAST(1 + d.doc_id % 30 AS INT) AS frames,
             CAST(12 + octet_length(encode(d.text)) AS INT) AS bytes,
             true AS decode_ok,
             round(coalesce((SELECT list_reduce(f.fl, (a, b) -> a + b)
                             FROM feats f WHERE f.doc_id = d.doc_id), 0.0), 4) AS feat_sum
      FROM documents d ORDER BY d.doc_id
    """.trim)
  )

  /** X20: pt→px geometry conversion (`convert_pt2px`,
    * create_index.py:30-37) — round(dpi/72 · pt) per coordinate, with
    * Python's banker's rounding (bround / round_even on both engines).
    */
  def convertPt2Px(pt: Seq[Double], dpi: Int = 96): Seq[Int] =
    pt.map(p => math.rint(dpi / 72.0 * p).toInt)

  /** Figure-boundary conversion over a synthetic pt-space region derived
    * from doc_id (the pdffigures regionBoundary analog,
    * create_index.py:50-52), with a bit-exact DuckDB oracle. Emitted as
    * four scalar INT columns (not an array) so the driver's pandas
    * hash-compare can factorize the result.
    */
  val q36Pt2Px = QueryDef(
    "q36_pt2px",
    (s, dir) => {
      val x1 = pmod(col("doc_id"), lit(612)).cast("double") * 0.37
      val y1 = pmod(col("doc_id") * 3, lit(792)).cast("double") * 0.53
      def px(p: org.apache.spark.sql.Column) = bround(p * 96.0 / 72.0).cast("int")
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          px(x1).as("x1_px"), px(y1).as("y1_px"),
          px(x1 + 108.25).as("x2_px"), px(y1 + 54.75).as("y2_px"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id,
                        (doc_id % 612) * 0.37::DOUBLE AS x1,
                        ((doc_id * 3) % 792) * 0.53::DOUBLE AS y1
                 FROM documents)
      SELECT doc_id,
             CAST(round_even(x1 * 96.0 / 72.0, 0) AS INT) AS x1_px,
             CAST(round_even(y1 * 96.0 / 72.0, 0) AS INT) AS y1_px,
             CAST(round_even((x1 + 108.25) * 96.0 / 72.0, 0) AS INT) AS x2_px,
             CAST(round_even((y1 + 54.75) * 96.0 / 72.0, 0) AS INT) AS y2_px
      FROM t ORDER BY doc_id
    """.trim)
  )

  /** Frame sampling through the stub codec: one media row explodes into
    * its every-5th frame indices (the doc→pages/frames flatMap shape,
    * rasterize.py analog). The header's frame count is pure arithmetic
    * (1 + doc_id % 30), so DuckDB reproduces the expansion bit-exactly —
    * the oracle checks the real decode→explode plumbing, not a fixture.
    */
  val q37FrameSample = QueryDef(
    "q37_frame_sample",
    (s, dir) => {
      import s.implicits._
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions(_.flatMap { case (id, text) =>
          sampleFrames(id, fakeMediaBlob(id, text), everyK = 5)
        })
        .toDF("doc_id", "frame_idx")
        .orderBy("doc_id", "frame_idx")
    },
    Some("""
      SELECT doc_id, CAST(unnest(generate_series(0, CAST(doc_id % 30 AS INT), 5)) AS INT) AS frame_idx
      FROM documents ORDER BY doc_id, frame_idx
    """.trim)
  )

  val all: Seq[QueryDef] = Seq(q26BinaryMeta, qxMediaFeatures, q36Pt2Px, q37FrameSample)
}
