package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ISO-BMFF (MP4) box-walk metadata extraction — the PRE-DECODE filter of
  * a real video curation pipeline: duration, track count and codec fourcc
  * come from the `moov` box tree alone, so a 100 TB pass can prune
  * too-short / wrong-codec / track-less files BEFORE paying for any frame
  * decode. The reference applies the same metadata-before-content
  * discipline when it sizes scans from file statistics instead of reading
  * data (`/root/reference/src/events/defaults/file_scan_config.rs`).
  *
  * Parsing is pure public-format structure (ISO/IEC 14496-12: length-
  * prefixed boxes, big-endian, containers nest): a generic box walker
  * recurses into `moov`/`trak`/`mdia`/`minf`/`stbl`, reads `mvhd`
  * (version 0's 32-bit and version 1's 64-bit timescale/duration) and
  * each track's `stsd` sample-entry fourcc. No codec is involved —
  * exactly why this path is REAL here while frame decode for MP4 remains
  * a stub ([[Multimodal.sampleFrames]]): the JDK has no MP4 decoder, but
  * the container layout needs none.
  *
  * Degradation contract (shared with every media operator): a truncated,
  * bit-flipped or size-corrupted payload yields a `parsed=false` row (or
  * sane partial metadata when the moov prefix survived) — never a thrown
  * task, never an unbounded loop (the walker's cursor strictly advances
  * and every box end is clamped to its parent's).
  */
object Mp4Meta {

  val mp4MetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = true),
    StructField("timescale", IntegerType, nullable = true),
    StructField("n_tracks", IntegerType, nullable = true),
    StructField("codecs", StringType, nullable = true),
    StructField("parsed", BooleanType, nullable = false)))

  /** Deterministic planted-MP4 generator: a minimal-but-well-formed
    * ISO-BMFF stream per document — `ftyp` + `moov[ mvhd, trak* ]` with
    * each trak nesting `mdia/minf/stbl/stsd` down to one sample entry.
    * Closed-form in `media_id`:
    * timescale = 500 + (id mod 4)*250, duration = 10000 + id mod 90000
    * (timescale units), n_tracks = 1 + id mod 3,
    * fourcc(t) = "avc1" if (id+t) even else "mp4a"; odd ids write mvhd
    * VERSION 1 (64-bit timescale/duration fields), even ids version 0 —
    * so a SQL oracle predicts every extracted field codec-free while both
    * mvhd layouts are exercised. The fixtures are minimal (no tkhd/mdhd/
    * sample tables) by design: the operator under test is the box WALK,
    * and a generic walker never requires sibling boxes it doesn't read.
    */
  def plantMp4s(docs: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(Multimodal.mediaSchema)
    Multimodal.fanOutIds(docs.select(col("doc_id"))).mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val timescale = 500 + (id % 4).toInt * 250
        val duration = 10000L + id % 90000L
        val nTracks = 1 + (id % 3).toInt
        val v1 = id % 2 == 1
        Row(id, "video", buildMp4(id, timescale, duration, nTracks, v1),
          Row(null, null, null, "video/mp4"))
      }
    }(enc)
  }

  /** Assemble the planted box tree (big-endian, length-prefixed). */
  private def buildMp4(id: Long, timescale: Int, duration: Long,
                       nTracks: Int, mvhdV1: Boolean): Array[Byte] = {
    def box(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(8 + body.length)
      out.putInt(8 + body.length)
      out.put(fourcc.getBytes("US-ASCII"))
      out.put(body)
      out.array()
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
        "iso2".getBytes("US-ASCII"))
    val mvhd = {
      // version 0: 4-byte creation/modification/timescale/duration;
      // version 1: 8-byte creation/modification/duration, 4-byte timescale.
      val body = java.nio.ByteBuffer.allocate(if (mvhdV1) 112 else 100)
      body.put(Array[Byte](if (mvhdV1) 1 else 0, 0, 0, 0)) // version+flags
      if (mvhdV1) {
        body.putLong(0L).putLong(0L)        // creation, modification
        body.putInt(timescale)
        body.putLong(duration)
      } else {
        body.putInt(0).putInt(0)
        body.putInt(timescale)
        body.putInt(duration.toInt)
      }
      body.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      body.putLong(0L)                       // reserved
      // identity matrix + 6 predefined zeros + next_track_ID
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(body.putInt)
      (0 until 6).foreach(_ => body.putInt(0))
      body.putInt(nTracks + 1)
      box("mvhd", body.array())
    }
    val traks = (0 until nTracks).map { t =>
      val fourcc = if ((id + t) % 2 == 0) "avc1" else "mp4a"
      // stsd: version+flags, entry_count=1, one entry (size + fourcc only
      // — a real entry carries codec config the walker doesn't read).
      val entry = box(fourcc, Array.emptyByteArray)
      val stsdBody = java.nio.ByteBuffer.allocate(8 + entry.length)
      stsdBody.putInt(0).putInt(1).put(entry)
      val stsd = box("stsd", stsdBody.array())
      box("trak", box("mdia", box("minf", box("stbl", stsd))))
    }
    val moov = box("moov", mvhd ++ traks.flatten)
    ftyp ++ moov
  }

  /** Walk the box tree of each payload and extract container metadata.
    * One narrow mapPartitions pass; payloads never shuffle (pass
    * `minParallelism` for externally-loaded one-file tables, as the other
    * media entry points since r13).
    */
  def parseMp4Meta(media: DataFrame, minParallelism: Int = 1): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mp4MetaSchema)
    val in = media.select(col("media_id"), col("data"))
    val fanned =
      if (minParallelism <= 1) in
      else in.repartition(minParallelism, col("media_id"))
    fanned.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes =
          if (r.isNullAt(1)) Array.emptyByteArray
          else r.getAs[Array[Byte]](1)
        val meta = try walk(bytes) catch { case _: Exception => NoMeta }
        if (meta.timescale <= 0)
          Row(id, null, null, null, null, false)
        else {
          val durMs =
            // Negative = absent; the upper guard keeps a bit-flipped v1
            // duration from overflowing the *1000 into a negative ms.
            if (meta.duration < 0 || meta.duration > Long.MaxValue / 1000L) null
            // *1000 then integer-divide: truncation, all-positive operands.
            else java.lang.Long.valueOf(meta.duration * 1000L / meta.timescale)
          Row(id, durMs, meta.timescale, meta.nTracks,
            if (meta.codecs.isEmpty) null else meta.codecs.mkString(","),
            true)
        }
      }
    }(enc)
  }

  private final case class Meta(timescale: Int, duration: Long,
                                nTracks: Int, codecs: List[String])
  private val NoMeta = Meta(-1, -1L, 0, Nil)

  private val containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Real container trees nest ~6 deep (moov/trak/mdia/minf/stbl); 32
    * leaves headroom for edit/meta boxes while keeping the recursion
    * bounded — WITHOUT the cap, a crafted payload of thousands of nested
    * 8-byte container boxes drives a `StackOverflowError`, which is an
    * `Error` the parse-side `catch Exception` does NOT absorb: the task
    * dies and the degradation contract breaks. Deeper boxes are simply
    * not descended into (metadata already found is kept).
    */
  private val MaxDepth = 32

  /** Generic ISO-BMFF walker. Bounded by construction: the cursor strictly
    * advances (boxes shorter than their 8/16-byte header terminate the
    * level), every child end is clamped to its parent's, a declared
    * size past the payload truncates rather than reads out of bounds, and
    * container recursion stops at [[MaxDepth]] — so corrupt size fields
    * and adversarial nesting degrade the result, never hang or throw.
    */
  private def walk(bytes: Array[Byte]): Meta = {
    val bb = java.nio.ByteBuffer.wrap(bytes) // big-endian by default
    var timescale = -1
    var duration = -1L
    var nTracks = 0
    val codecs = List.newBuilder[String]

    def fourcc(at: Int): String =
      new String(bytes, at, 4, "US-ASCII")

    def level(start: Int, end: Int, inTrak: Boolean, depth: Int): Unit = {
      if (depth > MaxDepth) return
      var pos = start
      while (pos + 8 <= end) {
        val size32 = bb.getInt(pos).toLong & 0xFFFFFFFFL
        val typ = fourcc(pos + 4)
        var bodyStart = pos + 8
        val size: Long =
          if (size32 == 0) (end - pos).toLong // box extends to parent end
          else if (size32 == 1) {             // 64-bit largesize
            if (pos + 16 > end) return
            bodyStart = pos + 16
            bb.getLong(pos + 8)
          } else size32
        if (size < (bodyStart - pos)) return  // corrupt: smaller than header
        val boxEnd = math.min(end.toLong, pos + size).toInt
        if (boxEnd <= pos) return             // overflow/corrupt: no advance
        typ match {
          case t if containers.contains(t) =>
            if (t == "trak") nTracks += 1
            level(bodyStart, boxEnd, inTrak = inTrak || t == "trak",
              depth + 1)
          case "mvhd" if boxEnd - bodyStart >= 4 =>
            val version = bytes(bodyStart) & 0xFF
            if (version == 1 && boxEnd - bodyStart >= 32) {
              timescale = bb.getInt(bodyStart + 20)
              duration = bb.getLong(bodyStart + 24)
            } else if (version == 0 && boxEnd - bodyStart >= 24) {
              timescale = bb.getInt(bodyStart + 12)
              duration = bb.getInt(bodyStart + 16).toLong & 0xFFFFFFFFL
            }
          case "stsd" if boxEnd - bodyStart >= 16 =>
            // version+flags(4), entry_count(4), first entry header(8).
            codecs += fourcc(bodyStart + 12)
          case _ => ()
        }
        pos = boxEnd
      }
    }

    level(0, bytes.length, inTrak = false, depth = 0)
    Meta(timescale, duration, nTracks, codecs.result())
  }
}
