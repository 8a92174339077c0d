package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL shard source/sink with a byte-offset seek index — the
  * reference's native record format (per-doc JSONL shards +
  * `gen_seek.py`'s offset map for O(1) random access into a shard,
  * SURVEY S5/K3). Parquet remains the primary format; this is the
  * interchange path a reference user would migrate FROM, so the
  * round-trip must be lossless (binary columns ride base64) and the
  * seek contract real: (file, offset, length) → exactly one record.
  *
  * Scale shape: writing is a map-only `to_json` projection; the seek
  * index is one pass per shard (a task per file via binaryFile — the
  * writer bounds shard size via the shard count, so a whole shard in
  * task memory is the same contract the reference's seek generator
  * relies on; at scale, raise `shards` so each stays executor-sized).
  */
object JsonlPages {

  /** Microsecond-precise timestamp format on BOTH sides — the default
    * to_json format truncates to milliseconds, which would silently
    * corrupt sub-ms timestamps through a "lossless" interchange path. */
  private val jsonOpts = Map(
    "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "dateFormat" -> "yyyy-MM-dd")

  /** Write any DataFrame as JSONL shards; BINARY columns are base64'd
    * under the same name so the round-trip schema is by-name. */
  def write(df: DataFrame, dir: String, shards: Int = 8): Unit = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case BinaryType => base64(col(f.name)).as(f.name)
        case _          => col(f.name)
      }
    }
    df.select(to_json(struct(cols.toIndexedSeq: _*), jsonOpts).as("value"))
      .repartition(shards)
      .write.mode("overwrite").text(dir)
  }

  /** Read JSONL shards back to the given schema; BINARY fields decode
    * from base64. Malformed lines fail loudly (ANSI discipline — a
    * corrupt shard must not silently drop records). */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val jsonSchema = StructType(schema.fields.map { f =>
      if (f.dataType == BinaryType) f.copy(dataType = StringType) else f
    })
    val parsed = spark.read.text(dir)
      .select(from_json(col("value"), jsonSchema, jsonOpts + ("mode" -> "FAILFAST")).as("r"))
    val cols = schema.fields.map { f =>
      f.dataType match {
        case BinaryType => unbase64(col(s"r.${f.name}")).as(f.name)
        case _          => col(s"r.${f.name}").as(f.name)
      }
    }
    parsed.select(cols.toIndexedSeq: _*)
  }

  /** The gen_seek analog: per record, (shard path, line index, byte
    * offset, byte length) plus a caller-chosen key extracted from the
    * JSON line — distributed, one task per shard. Offsets address the
    * raw shard bytes, so [[fetch]] can jump straight to any record.
    */
  def seekIndex(spark: SparkSession, dir: String, keyField: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .load(dir + "/*.txt")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long, String)]
        var start = 0
        var line = 0L
        var i = 0
        while (i <= bytes.length) {
          if (i == bytes.length || bytes(i) == '\n'.toByte) {
            if (i > start) {
              val s = new String(bytes, start, i - start, java.nio.charset.StandardCharsets.UTF_8)
              // a missing or non-scalar key fails LOUDLY (ANSI
              // discipline) — a silent '' key would collapse the
              // one-record-per-(offset,len) contract
              val key = topLevelScalar(s, keyField).getOrElse(throw new IllegalArgumentException(
                s"seekIndex: key field '$keyField' absent or not a scalar at $path line $line"))
              out += ((path, line, start.toLong, (i - start).toLong, key))
              line += 1
            }
            start = i + 1
          }
          i += 1
        }
        out
      }
      .toDF("path", "line_idx", "byte_offset", "byte_len", keyField)
  }

  /** Index after the closing quote of the JSON string opening at
    * `start`, or -1 when the string never closes (truncated record —
    * the caller must refuse it, not silently accept a prefix). */
  private def stringEnd(s: String, start: Int): Int = {
    var i = start + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\') i += 2
      else if (c == '"') return i + 1
      else i += 1
    }
    -1
  }

  private val pScalarToken =
    java.util.regex.Pattern.compile("-?\\d+(?:\\.\\d+)?(?:[eE][+-]?\\d+)?|true|false")

  /** Scalar value of TOP-LEVEL field `keyField` in a one-line JSON
    * object — depth-tracked, so a same-named field inside a nested
    * object or array never matches (a plain regex would). Strings come
    * back unescaped; numbers/booleans literally; absent, null, or
    * non-scalar → None.
    */
  private[io] def topLevelScalar(line: String, keyField: String): Option[String] = {
    val n = line.length
    var i = 0
    var depth = 0
    while (i < n) {
      line.charAt(i) match {
        case '{' | '[' => depth += 1; i += 1
        case '}' | ']' => depth -= 1; i += 1
        case '"' =>
          val end = stringEnd(line, i)
          if (end < 0) return None // truncated string: refuse, never prefix
          var j = end
          while (j < n && line.charAt(j).isWhitespace) j += 1
          if (depth == 1 && j < n && line.charAt(j) == ':') {
            val isMatch = unescapeJson(line.substring(i + 1, end - 1)) == keyField
            j += 1
            while (j < n && line.charAt(j).isWhitespace) j += 1
            if (isMatch) {
              if (j >= n) return None
              return line.charAt(j) match {
                case '"' =>
                  val ve = stringEnd(line, j)
                  if (ve < 0) None else Some(unescapeJson(line.substring(j + 1, ve - 1)))
                case '{' | '[' => None
                case _ =>
                  var k = j
                  while (k < n && ",}] \t".indexOf(line.charAt(k).toInt) < 0) k += 1
                  val tok = line.substring(j, k)
                  // only valid JSON scalars; a bare word is corruption
                  if (pScalarToken.matcher(tok).matches()) Some(tok) else None
              }
            } else i = j // continue from the value; the loop handles its kind
          } else i = end
        case _ => i += 1
      }
    }
    None
  }

  /** Minimal JSON string unescape for extracted key values (records are
    * single lines, so \n etc. can only appear escaped). */
  private def unescapeJson(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case other => sb.append(other); i += 2 // covers \" \\ \/
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Random-access one record by (path, offset, length) — the consumer
    * side of the seek contract. */
  def fetch(path: String, offset: Long, length: Long): String = {
    val p = if (path.startsWith("file:")) new java.net.URI(path).getPath else path
    val raf = new java.io.RandomAccessFile(p, "r")
    try {
      raf.seek(offset)
      val buf = new Array[Byte](length.toInt)
      raf.readFully(buf)
      new String(buf, java.nio.charset.StandardCharsets.UTF_8)
    } finally raf.close()
  }
}
