package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500) record parsing — the byte-level front door
  * of a real crawl pipeline: CommonCrawl delivers WARC files, not HTML
  * columns, so the p70-p73 web funnel is only "real end to end" once its
  * input is parsed out of WARC bytes. The format is public and simple:
  * each record is a `WARC/1.0` version line, CRLF-separated
  * `Name: value` headers (notably WARC-Type, WARC-Target-URI and the
  * mandatory Content-Length), a blank line, `Content-Length` payload
  * BYTES, and a CRLF CRLF record separator; records concatenate to form a
  * file.
  *
  * Same discipline as [[Mp4Meta]] (the other bounded byte walker):
  *  - parsing is one narrow mapPartitions pass — payloads never shuffle;
  *    downstream stages project the (small) fields they need and drop the
  *    payload inside the same stage;
  *  - the cursor strictly advances, every length is bounds-clamped, and a
  *    truncated / bit-flipped / length-corrupted file degrades to the
  *    records that parsed cleanly plus one `ok=false` tail row — never a
  *    thrown task, never an unbounded loop.
  *
  * Planted fixtures ([[plantWarcs]]) wrap the SAME closed-form pages and
  * URLs as the HTML family (`Html.plantHtml`, `Urls.plantUrls`), so a
  * DuckDB oracle predicts every parsed field — record counts, types,
  * URIs, byte lengths, payload md5 — without owning a WARC parser, and
  * the full web funnel re-run from WARC input must reproduce the
  * HTML-column funnel bit for bit.
  */
object Warc {

  val warcSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("rec_idx", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("ok", BooleanType, nullable = false)))

  /** PNG magic bytes — the sniff fallback for responses whose
    * Content-Type header is missing (real crawls carry plenty).
    */
  private val PngMagic: Array[Byte] =
    Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0D.toByte, 0x0A.toByte, 0x1A.toByte, 0x0A.toByte)

  /** RIFF/WAVE container magic: bytes 0-3 `RIFF`, bytes 8-11 `WAVE`. */
  private val RiffMagic: Array[Byte] = "RIFF".getBytes("US-ASCII")
  private val WaveMagic: Array[Byte] = "WAVE".getBytes("US-ASCII")

  /** GIF container magic (both published versions). Animated GIF is the
    * repo's carried video container, so the router labels it `video`.
    */
  private val Gif89Magic: Array[Byte] = "GIF89a".getBytes("US-ASCII")
  private val Gif87Magic: Array[Byte] = "GIF87a".getBytes("US-ASCII")

  /** Modality router for parsed response records — the p69
    * container-router shape at the crawl front door: magic bytes FIRST
    * (real crawls mislabel constantly — `application/octet-stream`,
    * `text/plain`, or plain-wrong `text/html` on a PNG are routine, and
    * a mislabeled image silently lost to the HTML path never reaches
    * dedup), then the Content-Type header for payloads whose container
    * magic we don't sniff. A payload opening with the PNG / RIFF-WAVE
    * signature IS that container regardless of what the server claimed —
    * the 8-/12-byte signatures make false positives vanishingly
    * unlikely. Pure column expression — codegen'd, no UDF.
    */
  def contentKind(contentType: org.apache.spark.sql.Column,
                  payload: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val ct = lower(coalesce(contentType, lit("")))
    when(substring(payload, 1, PngMagic.length) === lit(PngMagic), lit("image"))
      .when(substring(payload, 1, 4) === lit(RiffMagic) &&
        substring(payload, 9, 4) === lit(WaveMagic), lit("audio"))
      .when(substring(payload, 1, 6) === lit(Gif89Magic) ||
        substring(payload, 1, 6) === lit(Gif87Magic), lit("video"))
      .when(ct.startsWith("video/") || ct === "image/gif", lit("video"))
      .when(ct.startsWith("image/"), lit("image"))
      .when(ct.startsWith("audio/"), lit("audio"))
      .otherwise(lit("html"))
  }

  /** Upper bound on records per file: a crafted stream of minimal records
    * must not accumulate an unbounded row buffer per input row.
    */
  val MaxRecords = 10000

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Deterministic planted WARC file per document: a `warcinfo` record, a
    * `request` record for every id % 3 == 0 (so multi-type skipping is
    * exercised), and a `response` record whose WARC-Target-URI is the
    * planted URL ([[Urls.plantUrls]] rule) and whose payload is the
    * planted page ([[Html.plantHtml]] rule) — every byte a pure function
    * of (id, text), so the oracle rebuilds the parse output closed-form.
    */
  def plantWarcs(docs: DataFrame): DataFrame = plantWarcFiles(docs, false)

  /** [[plantWarcs]] plus, for every id % 4 == 0, an `image/png` response
    * record carrying the planted PNG ([[Multimodal.plantedPngBytes]] —
    * the SAME closed-form pixels the dHash oracle predicts) and, for
    * every id % 6 == 0, an `audio/wav` response carrying the planted
    * 8-bit WAV ([[Multimodal.plantedWavBytes]] — the clip the
    * fingerprint oracle predicts): a mixed crawl segment, the fixture
    * for Content-Type routing at the WARC front door.
    */
  def plantMixedWarcs(docs: DataFrame): DataFrame = plantWarcFiles(docs, true)

  /** [[plantWarcs]] plus, for every id % 5 == 0, a GIF video response
    * whose Content-Type header is a DELIBERATE `application/octet-stream`
    * mislabel (the router must rescue it by magic bytes) and whose
    * payload is [[Multimodal.plantedGifFpBytes]] of `(id/10)*10` — so
    * id ≡ 5 (mod 10) carries a byte-identical COPY of id−5's clip: the
    * crawl-embedded video-dedup fixture.
    */
  def plantVideoWarcs(docs: DataFrame): DataFrame =
    plantWarcFiles(docs, withImages = false, withVideo = true)

  /** Dedup-grade mixed crawl segment — the p91 capstone fixture:
    * [[plantWarcs]] plus fingerprint-grade media responses with PLANTED
    * DUPLICATES. For every id % 4 == 0 an `image/png` response carrying
    * [[Multimodal.plantedPngFpBytes]] of `(id/8)*8` — so id ≡ 4 (mod 8)
    * carries a byte-identical COPY of id−4's image (one planted near-dup
    * cluster per 8 ids); for every id % 6 == 0 an `audio/wav` response
    * carrying [[Multimodal.plantedWavFpBytes]] of `(id/12)*12` — id ≡ 6
    * (mod 12) copies id−6's clip. Sources stay closed-form in id, so the
    * per-modality dedup oracles predict every cluster without a codec,
    * and the fp rules mint no phase-twin artifacts at corpus density.
    */
  def plantMixedWarcsFp(docs: DataFrame): DataFrame =
    plantWarcFiles(docs, true, fpDedup = true)

  /** FOUR-modality capstone fixture: [[plantMixedWarcsFp]]'s html +
    * image + audio responses PLUS [[plantVideoWarcs]]'s mislabeled
    * (`application/octet-stream`) animated-GIF responses under the
    * `(id/10)*10` copy rule — one crawl segment exercising every branch
    * of the router, including the magic-byte video rescue.
    */
  def plantFullWarcsFp(docs: DataFrame): DataFrame =
    plantWarcFiles(docs, withImages = true, fpDedup = true,
      withVideo = true)

  /** PAIRED-crawl fixture — the image–text pair family's front door:
    * html responses carry the FIGURE-bearing planted page
    * ([[Html.plantedPageWithFigures]] — `<img src>` + closed-form
    * alt/figcaption text), and every id % 4 == 0 file carries an
    * `image/png` response whose WARC-Target-URI is the messy crawl-side
    * image URL ([[Urls.plantedImageUrl]]) and whose payload is the
    * dedup-grade planted PNG under the `(id/8)*8` copy rule — so the
    * extracted pairs can be joined on canonical URL AND folded through
    * perceptual image dedup (the p143 capstone), all closed-form in id.
    */
  def plantPairedWarcs(docs: DataFrame): DataFrame =
    plantWarcFiles(docs, withImages = false, paired = true)

  /** The [[plantPairedWarcs]] shape for the AUDIO modality: html
    * responses carry the `<audio>`-figure page
    * ([[Html.plantedPageWithAudioFigures]]), and every id % 6 == 0
    * file carries an `audio/wav` response at the messy crawl-side clip
    * URL ([[Urls.plantedAudioUrl]]) with the dedup-grade planted WAV
    * under the `(id/12)*12` copy rule.
    */
  def plantAudioPairedWarcs(docs: DataFrame): DataFrame =
    plantWarcFiles(docs, withImages = false, pairedAudio = true)

  /** The [[plantPairedWarcs]] shape for the VIDEO modality: html
    * responses carry the `<video>`-figure page
    * ([[Html.plantedPageWithVideoFigures]] — direct-src and
    * nested-`<source>` markup alternating by parity), and every
    * id % 5 == 0 file carries an animated-GIF response at the messy
    * crawl-side clip URL ([[Urls.plantedVideoUrl]]) whose Content-Type
    * is the DELIBERATE `application/octet-stream` mislabel (the router
    * must rescue it by magic bytes, same as [[plantVideoWarcs]]) under
    * the `(id/10)*10` copy rule.
    */
  def plantVideoPairedWarcs(docs: DataFrame): DataFrame =
    plantWarcFiles(docs, withImages = false, pairedVideo = true)

  /** The FULL paired crawl — every modality's pair fixture in ONE
    * segment: pages carry all three figure families
    * ([[Html.plantedPageWithAllFigures]]) and each file carries its
    * id-rule's media records (image id%4, audio id%6, video id%5 —
    * video still Content-Type-mislabeled) at their own messy URLs
    * under the per-modality copy rules. The one-crawl-three-products
    * router fixture.
    */
  def plantAllPairedWarcs(docs: DataFrame): DataFrame =
    plantWarcFiles(docs, withImages = false, paired = true,
      pairedAudio = true, pairedVideo = true, pairedAll = true)

  private def plantWarcFiles(docs: DataFrame, withImages: Boolean,
                             fpDedup: Boolean = false,
                             withVideo: Boolean = false,
                             paired: Boolean = false,
                             pairedAudio: Boolean = false,
                             pairedVideo: Boolean = false,
                             pairedAll: Boolean = false): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(Multimodal.mediaSchema)
    val page =
      if (pairedAll)
        Html.plantedPageWithAllFigures(col("doc_id"), col("text"))
      else if (paired) Html.plantedPageWithFigures(col("doc_id"), col("text"))
      else if (pairedAudio)
        Html.plantedPageWithAudioFigures(col("doc_id"), col("text"))
      else if (pairedVideo)
        Html.plantedPageWithVideoFigures(col("doc_id"), col("text"))
      else Html.plantedPage(col("doc_id"), col("text"))
    // Fan out FIRST (the plantPngs discipline: one-file fixtures otherwise
    // pin the assembly to a single task), then build page + URL as column
    // expressions of (id, text) in the same narrow stage — no self-join.
    Multimodal.fanOutIds(docs.select(col("doc_id"), col("text")))
      .select(col("doc_id").as("id"),
        page.as("html"),
        Urls.plantedUrl(col("doc_id")).as("url"),
        Urls.plantedImageUrl(col("doc_id")).as("imgurl"),
        Urls.plantedAudioUrl(col("doc_id")).as("audurl"),
        Urls.plantedVideoUrl(col("doc_id")).as("vidurl"))
      .mapPartitions { rows =>
        val writers =
          if (withImages || pairedAudio) Multimodal.audioWriters() else Nil
        val gifWriter =
          if (withVideo || pairedVideo) {
            javax.imageio.ImageIO.setUseCache(false)
            val w = javax.imageio.ImageIO
              .getImageWritersByFormatName("gif").next()
            Multimodal.disposeOnTaskEnd(() => w.dispose())
            w
          } else null
        rows.map { r =>
          val id = r.getLong(0)
          val html = r.getString(1)
          val url = r.getString(2)
          val imgUrl = r.getString(3)
          val audUrl = r.getString(4)
          val vidUrl = r.getString(5)
          val bos = new java.io.ByteArrayOutputStream()
          def record(headers: Seq[(String, String)], payload: Array[Byte]): Unit = {
            bos.write("WARC/1.0\r\n".getBytes("US-ASCII"))
            (headers :+ ("Content-Length" -> payload.length.toString))
              .foreach { case (k, v) =>
                bos.write(s"$k: $v\r\n".getBytes("US-ASCII"))
              }
            bos.write(Crlf)
            bos.write(payload)
            bos.write(Crlf); bos.write(Crlf)
          }
          record(
            Seq("WARC-Type" -> "warcinfo",
              "WARC-Record-ID" -> s"<urn:graft:info:$id>"),
            s"software graft-crawler $id".getBytes("UTF-8"))
          if (id % 3 == 0)
            record(
              Seq("WARC-Type" -> "request",
                "WARC-Record-ID" -> s"<urn:graft:req:$id>",
                "WARC-Target-URI" -> url),
              s"GET $url".getBytes("UTF-8"))
          record(
            Seq("WARC-Type" -> "response",
              "WARC-Record-ID" -> s"<urn:graft:resp:$id>",
              "WARC-Target-URI" -> url,
              "Content-Type" -> "text/html"),
            html.getBytes("UTF-8"))
          if (withImages && id % 4 == 0) {
            javax.imageio.ImageIO.setUseCache(false)
            record(
              Seq("WARC-Type" -> "response",
                "WARC-Record-ID" -> s"<urn:graft:img:$id>",
                "WARC-Target-URI" -> (url + "/img.png"),
                "Content-Type" -> "image/png"),
              if (fpDedup) Multimodal.plantedPngFpBytes((id / 8) * 8)
              else Multimodal.plantedPngBytes(id))
          }
          // Audio-paired fixture: the clip record at its own messy URL,
          // payload under the (id/12)*12 copy rule.
          if (pairedAudio && id % 6 == 0)
            record(
              Seq("WARC-Type" -> "response",
                "WARC-Record-ID" -> s"<urn:graft:paud:$id>",
                "WARC-Target-URI" -> audUrl,
                "Content-Type" -> "audio/wav"),
              Multimodal.plantedWavFpBytes((id / 12) * 12, writers))
          // Paired fixture: the image record lives at its OWN messy URL
          // (not a page-URL suffix) so the pair join exercises real
          // canonicalization; payload under the (id/8)*8 copy rule.
          if (paired && id % 4 == 0) {
            javax.imageio.ImageIO.setUseCache(false)
            record(
              Seq("WARC-Type" -> "response",
                "WARC-Record-ID" -> s"<urn:graft:pimg:$id>",
                "WARC-Target-URI" -> imgUrl,
                "Content-Type" -> "image/png"),
              Multimodal.plantedPngFpBytes((id / 8) * 8))
          }
          if (withImages && id % 6 == 0)
            record(
              Seq("WARC-Type" -> "response",
                "WARC-Record-ID" -> s"<urn:graft:aud:$id>",
                "WARC-Target-URI" -> (url + "/clip.wav"),
                "Content-Type" -> "audio/wav"),
              if (fpDedup) Multimodal.plantedWavFpBytes((id / 12) * 12, writers)
              else Multimodal.plantedWavBytes(id, writers))
          // Video responses carry a DELIBERATELY unhelpful Content-Type:
          // the sniff-first router must rescue them by GIF magic alone
          // (the real-crawl mislabel case the r15 ADVICE flagged). The
          // (id/10)*10 source rule plants one byte-identical duplicate
          // CLIP per 10 ids — the video analog of the img/aud copy rules.
          if (withVideo && id % 5 == 0)
            record(
              Seq("WARC-Type" -> "response",
                "WARC-Record-ID" -> s"<urn:graft:vid:$id>",
                "WARC-Target-URI" -> (url + "/anim.gif"),
                "Content-Type" -> "application/octet-stream"),
              Multimodal.plantedGifFpBytes((id / 10) * 10, gifWriter))
          // Video-paired fixture: the clip record at its OWN messy URL
          // (the pair join exercises real canonicalization), still
          // Content-Type-mislabeled (the router rescues it by GIF magic
          // alone); payload under the (id/10)*10 copy rule.
          if (pairedVideo && id % 5 == 0)
            record(
              Seq("WARC-Type" -> "response",
                "WARC-Record-ID" -> s"<urn:graft:pvid:$id>",
                "WARC-Target-URI" -> vidUrl,
                "Content-Type" -> "application/octet-stream"),
              Multimodal.plantedGifFpBytes((id / 10) * 10, gifWriter))
          Row(id, "web", bos.toByteArray,
            Row(null, null, null, "application/warc"))
        }
      }(enc)
  }

  /** Parse each payload's WARC records. One narrow mapPartitions pass;
    * pass `minParallelism` for externally-loaded one-file tables (the
    * r13 media-entry-point convention).
    */
  def parseWarc(media: DataFrame, minParallelism: Int = 1): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(warcSchema)
    Multimodal.fanned(media.select(col("media_id"), col("data")), minParallelism)
      .flatMap { r =>
        val id = r.getLong(0)
        val bytes =
          if (r.isNullAt(1)) Array.emptyByteArray
          else r.getAs[Array[Byte]](1)
        try parseRecords(id, bytes)
        catch { case _: Exception =>
          Seq(Row(id, 0, null, null, null, null, null, false))
        }
      }(enc)
  }

  /** Bounded record walker. Every parse failure emits ONE `ok=false` row
    * at the failing index and stops — prefix records that parsed cleanly
    * are kept (the 100 TB contract: one corrupt record loses its file's
    * tail, not the task).
    */
  private def parseRecords(id: Long, bytes: Array[Byte]): Seq[Row] = {
    val out = Seq.newBuilder[Row]
    var pos = 0
    var idx = 0
    var failed = false
    // index of the next CRLF at/after `from`, or -1
    def crlfAt(from: Int): Int = {
      var i = from
      while (i + 1 < bytes.length) {
        if (bytes(i) == '\r' && bytes(i + 1) == '\n') return i
        i += 1
      }
      -1
    }
    // UTF-8, not US-ASCII: WARC/1.0 header VALUES (notably
    // WARC-Target-URI) may carry non-ASCII bytes; UTF-8 is
    // ASCII-compatible so the planted fixtures are unaffected while real
    // crawl URIs survive unmangled.
    def headerStr(from: Int, until: Int): String =
      new String(bytes, from, until - from, java.nio.charset.StandardCharsets.UTF_8)
    while (!failed && pos < bytes.length && idx < MaxRecords) {
      val verEnd = crlfAt(pos)
      if (verEnd < 0 || !headerStr(pos, verEnd).startsWith("WARC/")) {
        out += Row(id, idx, null, null, null, null, null, false); failed = true
      } else {
        var cur = verEnd + 2
        var warcType: String = null
        var targetUri: String = null
        var contentType: String = null
        var contentLength = -1L
        var headersOk = true
        var blankSeen = false
        while (headersOk && !blankSeen) {
          val lineEnd = crlfAt(cur)
          if (lineEnd < 0) headersOk = false
          else if (lineEnd == cur) { blankSeen = true; cur = lineEnd + 2 }
          else {
            val line = headerStr(cur, lineEnd)
            val sep = line.indexOf(':')
            if (sep > 0) {
              // Locale.ROOT: under a Turkish-family default locale a bare
              // toLowerCase maps I to dotless-i and "WARC-Target-URI"
              // would never match — a silent null target_uri.
              val k = line.substring(0, sep).trim
                .toLowerCase(java.util.Locale.ROOT)
              val v = line.substring(sep + 1).trim
              k match {
                case "warc-type" => warcType = v
                case "warc-target-uri" => targetUri = v
                case "content-type" => contentType = v
                case "content-length" =>
                  contentLength =
                    try v.toLong catch { case _: NumberFormatException => -1L }
                case _ => ()
              }
            }
            cur = lineEnd + 2
          }
        }
        if (!headersOk || contentLength < 0 ||
            contentLength > (bytes.length - cur).toLong) {
          out += Row(id, idx, warcType, targetUri, contentType,
            if (contentLength >= 0) java.lang.Long.valueOf(contentLength) else null,
            null, false)
          failed = true
        } else {
          val payload = java.util.Arrays.copyOfRange(
            bytes, cur, cur + contentLength.toInt)
          out += Row(id, idx, warcType, targetUri, contentType,
            java.lang.Long.valueOf(contentLength), payload, true)
          cur += contentLength.toInt
          // record separator CRLF CRLF (tolerate EOF right after payload)
          var sepSkipped = 0
          while (sepSkipped < 4 && cur < bytes.length &&
                 (bytes(cur) == '\r' || bytes(cur) == '\n')) {
            cur += 1; sepSkipped += 1
          }
          if (cur < bytes.length && sepSkipped < 4) {
            // garbage where the separator should be
            out += Row(id, idx + 1, null, null, null, null, null, false)
            failed = true
          }
          pos = cur
          idx += 1
        }
      }
    }
    // No-silent-caps: a file with more than MaxRecords records keeps its
    // parsed prefix but must MARK the dropped tail, same contract as any
    // other truncation (one ok=false row downstream can detect).
    if (!failed && pos < bytes.length && idx == MaxRecords)
      out += Row(id, idx, null, null, null, null, null, false)
    out.result()
  }
}
