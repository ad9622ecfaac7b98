package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Urls, Warc}

class WarcSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, s"alpha beta gamma delta epsilon doc$i words here now"))
      .toDF("doc_id", "text")
  }

  private def plantedBytes(id: Long): Array[Byte] =
    Warc.plantWarcs(docs(Seq(id))).collect()(0).getAs[Array[Byte]]("data")

  private def mediaDf(rows: Seq[(Long, Array[Byte])]) = {
    import spark.implicits._
    rows.toDF("media_id", "data")
  }

  test("planted multi-record files parse back exactly: types in order, " +
    "target URI = planted URL, payload bytes = framed Content-Length") {
    val parsed = Warc.parseWarc(Warc.plantWarcs(docs(Seq(5L, 6L))))
      .orderBy(col("media_id"), col("rec_idx")).collect()
    // id=5: warcinfo + response; id=6 (6%3==0): warcinfo + request + response.
    assert(parsed.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((5L, 0, "warcinfo"), (5L, 1, "response"),
        (6L, 0, "warcinfo"), (6L, 1, "request"), (6L, 2, "response")))
    assert(parsed.forall(_.getAs[Boolean]("ok")))
    val wantUrl5 = docs(Seq(5L))
      .select(Urls.plantedUrl(col("doc_id"))).collect()(0).getString(0)
    val resp5 = parsed.find(r => r.getLong(0) == 5L && r.getInt(1) == 1).get
    assert(resp5.getAs[String]("target_uri") == wantUrl5)
    val payload = resp5.getAs[Array[Byte]]("payload")
    assert(payload.length.toLong == resp5.getAs[Long]("content_length"))
    val html = new String(payload, "UTF-8")
    assert(html.startsWith("<html><head><title>doc 5</title>"))
    assert(html.endsWith("</body></html>"))
    // warcinfo has no target URI.
    assert(parsed.filter(_.getString(2) == "warcinfo")
      .forall(_.isNullAt(3)))
  }

  test("mixed plant: every 4th file carries an image/png response whose " +
    "payload is the planted PNG, byte for byte; content_type parses back") {
    val parsed = Warc.parseWarc(Warc.plantMixedWarcs(docs(Seq(4L, 5L))))
      .orderBy(col("media_id"), col("rec_idx")).collect()
    val types4 = parsed.filter(_.getLong(0) == 4L)
      .map(r => (r.getString(2), r.getAs[String]("content_type"))).toSeq
    assert(types4 == Seq(("warcinfo", null), ("response", "text/html"),
      ("response", "image/png")))
    assert(parsed.filter(_.getLong(0) == 5L)
      .forall(_.getAs[String]("content_type") != "image/png"))
    val img = parsed.find(r => r.getLong(0) == 4L &&
      r.getAs[String]("content_type") == "image/png").get
    val wantPng = graft.operators.Multimodal.plantPngs(docs(Seq(4L)))
      .collect()(0).getAs[Array[Byte]]("data")
    assert(java.util.Arrays.equals(img.getAs[Array[Byte]]("payload"), wantPng),
      "embedded image payload differs from the planted PNG stream")
    // Without images the plant is byte-identical to plantWarcs (p76/p77's
    // oracles depend on that).
    assert(java.util.Arrays.equals(
      Warc.plantMixedWarcs(docs(Seq(5L))).collect()(0).getAs[Array[Byte]]("data"),
      plantedBytes(5L)))
  }

  test("contentKind sniffs PNG/RIFF magic FIRST (mislabeled crawls route " +
    "by payload), falls back to the Content-Type header, never nulls out") {
    import spark.implicits._
    val png = graft.operators.Multimodal.plantPngs(docs(Seq(8L)))
      .collect()(0).getAs[Array[Byte]]("data")
    val wav = graft.operators.Multimodal.plantWavs(docs(Seq(8L)))
      .collect()(0).getAs[Array[Byte]]("data")
    val rows = Seq(
      (1L, "image/png", "nope".getBytes("UTF-8")), // header (no magic match)
      (2L, "IMAGE/JPEG", png), // case-insensitive (and magic agrees)
      (3L, null, png), // sniffed, header missing
      (4L, null, "<html></html>".getBytes("UTF-8")),
      (5L, "text/html", png), // MISLABELED image: magic wins
      (6L, "audio/wav", "nope".getBytes("UTF-8")),
      (7L, null, wav), // RIFF/WAVE sniffed
      (8L, null, "RIFFxxxxNOPE".getBytes("US-ASCII")), // RIFF but not WAVE
      (9L, "application/octet-stream", png), // unhelpful header: magic wins
      (10L, "application/octet-stream", wav),
      (11L, "text/html", wav), // MISLABELED audio: magic wins
      (12L, "application/octet-stream", "junk".getBytes("UTF-8")), // no magic
      (13L, "", png), // empty-string header, sniffed
      (14L, "application/octet-stream", "GIF89a-junk".getBytes("US-ASCII")),
      (15L, "text/html", "GIF87a-junk".getBytes("US-ASCII")), // mislabeled
      (16L, "image/gif", "nope".getBytes("UTF-8")), // gif header, no magic
      (17L, "video/mp4", "nope".getBytes("UTF-8")), // video/* header
      (18L, null, "GIFxx-not-magic".getBytes("US-ASCII"))) // GIF prefix only
      .toDF("id", "content_type", "payload")
    val got = rows.select(col("id"),
      Warc.contentKind(col("content_type"), col("payload")).as("kind"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "image", 2L -> "image", 3L -> "image",
      4L -> "html", 5L -> "image", 6L -> "audio", 7L -> "audio",
      8L -> "html", 9L -> "image", 10L -> "audio", 11L -> "audio",
      12L -> "html", 13L -> "image", 14L -> "video", 15L -> "video",
      16L -> "video", 17L -> "video", 18L -> "html"))
  }

  test("video plant: every 5th file carries a GIF response labeled " +
    "application/octet-stream; id = 5 mod 10 embeds id-5's clip byte for " +
    "byte; the router rescues ALL of them by magic") {
    val recs = Warc.parseWarc(Warc.plantVideoWarcs(docs((0L until 40L).toSeq)))
      .filter(col("ok") && col("warc_type") === "response")
      .withColumn("kind",
        Warc.contentKind(col("content_type"), col("payload")))
    val vids = recs.filter(col("kind") === "video")
      .select("media_id", "payload", "content_type").collect()
    assert(vids.map(_.getLong(0)).sorted.toSeq ==
      (0L until 40L).filter(_ % 5 == 0))
    assert(vids.forall(_.getString(2) == "application/octet-stream"))
    val byId = vids.map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    (0L until 40L).filter(i => i % 10 == 5).foreach { id =>
      assert(java.util.Arrays.equals(byId(id), byId(id - 5)),
        s"id=$id is not a byte copy of ${id - 5}")
    }
    // and nothing else routed video: html responses stayed html
    assert(recs.filter(col("kind") === "html").count() == 40)
  }

  test("fp-dedup mixed plant: id=4 mod 8 carries id-4's fp image byte for " +
    "byte, id=6 mod 12 carries id-6's fp clip — the planted copy clusters " +
    "the p91 capstone dedups") {
    val parsed = Warc.parseWarc(Warc.plantMixedWarcsFp(docs(Seq(8L, 12L, 18L))))
      .filter(col("content_type").isin("image/png", "audio/wav")).collect()
      .map(r => (r.getLong(0), r.getAs[String]("content_type")) ->
        r.getAs[Array[Byte]]("payload")).toMap
    // id=8: own image (8//8*8 = 8); id=12: copy of 8's image (12//8*8 = 8)
    // and own clip (12//12*12 = 12); id=18: copy of 12's clip (18//12*12=12).
    val fpPng8 = graft.operators.Multimodal.plantPngsFp(docs(Seq(8L)))
      .collect()(0).getAs[Array[Byte]]("data")
    val fpWav12 = graft.operators.Multimodal.plantWavsFp(docs(Seq(12L)))
      .collect()(0).getAs[Array[Byte]]("data")
    assert(java.util.Arrays.equals(parsed((8L, "image/png")), fpPng8))
    assert(java.util.Arrays.equals(parsed((12L, "image/png")), fpPng8),
      "id 12 must embed id 8's image (the planted copy)")
    assert(java.util.Arrays.equals(parsed((12L, "audio/wav")), fpWav12))
    assert(java.util.Arrays.equals(parsed((18L, "audio/wav")), fpWav12),
      "id 18 must embed id 12's clip (the planted copy)")
  }

  test("mixed plant: every 6th file also carries an audio/wav response " +
    "whose payload is the planted WAV, byte for byte") {
    val parsed = Warc.parseWarc(Warc.plantMixedWarcs(docs(Seq(12L))))
      .orderBy(col("rec_idx")).collect()
    // 12%3==0 (request), 12%4==0 (image), 12%6==0 (audio).
    assert(parsed.map(_.getAs[String]("content_type")).toSeq ==
      Seq(null, null, "text/html", "image/png", "audio/wav"))
    val aud = parsed.find(_.getAs[String]("content_type") == "audio/wav").get
    val wantWav = graft.operators.Multimodal.plantWavs(docs(Seq(12L)))
      .collect()(0).getAs[Array[Byte]]("data")
    assert(java.util.Arrays.equals(aud.getAs[Array[Byte]]("payload"), wantWav),
      "embedded audio payload differs from the planted WAV stream")
  }

  test("truncation at EVERY byte boundary degrades, never throws: clean " +
    "prefix records kept, ok=false tail, strictly bounded output") {
    val full = plantedBytes(9L) // 9%3==0: three records
    val fullRecs = Warc.parseWarc(mediaDf(Seq(9L -> full))).collect()
    assert(fullRecs.length == 3 && fullRecs.forall(_.getAs[Boolean]("ok")))
    // Parse every truncation (the payload is ~1 KB; step 1 keeps it cheap
    // and total — a walker bug at ANY cut point surfaces). Cut 0 is skipped:
    // an empty file is a valid zero-record parse and emits no rows.
    val cuts = (1 until full.length).map(n =>
      (n.toLong, java.util.Arrays.copyOfRange(full, 0, n)))
    val out = Warc.parseWarc(mediaDf(cuts))
      .groupBy(col("media_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("ok"), 1).otherwise(0)).as("n_ok"),
        max(col("rec_idx")).as("max_idx"))
      .collect()
    assert(out.length == full.length - 1)
    out.foreach { r =>
      val (n, nOk) = (r.getAs[Long]("n"), r.getAs[Long]("n_ok"))
      assert(n <= 4, s"cut ${r.getLong(0)}: too many rows $n")
      assert(nOk <= 3 && n - nOk <= 1,
        s"cut ${r.getLong(0)}: $nOk ok of $n (at most one failure row)")
    }
    // A cut strictly inside record 2's payload keeps records 0 and 1.
    val resp = fullRecs(2)
    val respStart = full.length - 4 - resp.getAs[Long]("content_length").toInt
    val mid = Warc.parseWarc(mediaDf(Seq(1L ->
      java.util.Arrays.copyOfRange(full, 0, respStart + 10)))).collect()
    assert(mid.count(_.getAs[Boolean]("ok")) == 2)
  }

  test("seeded mutation fuzz: 300 corrupted files (bit flips, splices, " +
    "digit edits in Content-Length) degrade, never throw, never emit " +
    "payloads longer than the file") {
    val base = plantedBytes(12L)
    val rnd = new scala.util.Random(20260815L)
    val mutants = (0 until 300).map { i =>
      val b = base.clone()
      rnd.nextInt(3) match {
        case 0 => // flip 1-8 random bytes
          (0 until 1 + rnd.nextInt(8)).foreach { _ =>
            b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
          }
        case 1 => // zero a CRLF (merges header lines / breaks separators)
          val idx = b.indices.find(j =>
            j > rnd.nextInt(b.length) && b(j) == '\r').getOrElse(0)
          b(idx) = ' '
        case 2 => // scribble digits over a region (hits Content-Length often)
          val at = rnd.nextInt(b.length - 4)
          (0 until 4).foreach(j => b(at + j) = ('0' + rnd.nextInt(10)).toByte)
      }
      (i.toLong, b)
    }
    val rows = Warc.parseWarc(mediaDf(mutants)).collect()
    assert(rows.nonEmpty)
    val byId = rows.groupBy(_.getLong(0))
    assert(byId.size == 300)
    rows.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) <= Warc.MaxRecords)
      if (!r.isNullAt(r.fieldIndex("payload")))
        assert(r.getAs[Array[Byte]]("payload").length <= base.length,
          s"payload longer than file for ${r.getLong(0)}")
    }
    // Failure rows terminate a file's parse: at most one non-ok per file.
    byId.values.foreach { rs =>
      assert(rs.count(!_.getAs[Boolean]("ok")) <= 1)
    }
  }

  test("record-count bound: a crafted stream of minimal records stops at " +
    "MaxRecords instead of buffering unbounded rows") {
    val one = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 1\r\n" +
      "\r\nx\r\n\r\n").getBytes("US-ASCII")
    val bos = new java.io.ByteArrayOutputStream()
    (0 until Warc.MaxRecords + 50).foreach(_ => bos.write(one))
    val rows = Warc.parseWarc(mediaDf(Seq(1L -> bos.toByteArray))).collect()
    // MaxRecords clean rows + ONE ok=false truncation marker (the dropped
    // tail must be detectable, never silently capped).
    assert(rows.length == Warc.MaxRecords + 1, s"got ${rows.length} rows")
    assert(rows.count(!_.getAs[Boolean]("ok")) == 1)
    assert(!rows.maxBy(_.getInt(1)).getAs[Boolean]("ok"))
  }

  test("record-count bound marker is absent when the file ends exactly at " +
    "MaxRecords records") {
    val one = ("WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 1\r\n" +
      "\r\nx\r\n\r\n").getBytes("US-ASCII")
    val bos = new java.io.ByteArrayOutputStream()
    (0 until Warc.MaxRecords).foreach(_ => bos.write(one))
    val rows = Warc.parseWarc(mediaDf(Seq(1L -> bos.toByteArray))).collect()
    assert(rows.length == Warc.MaxRecords)
    assert(rows.forall(_.getAs[Boolean]("ok")))
  }

  test("empty and null payloads degrade to a single ok=false row... or " +
    "nothing for a zero-byte file") {
    import spark.implicits._
    val junk = Seq(
      (1L, Array.emptyByteArray),
      (2L, null.asInstanceOf[Array[Byte]]),
      (3L, "not a warc at all".getBytes("UTF-8"))).toDF("media_id", "data")
    val rows = Warc.parseWarc(junk).collect()
    // Empty input: zero records is a valid parse of a zero-record file.
    assert(rows.forall(r => !r.getAs[Boolean]("ok") || r.getLong(0) < 0))
    assert(rows.map(_.getLong(0)).toSet == Set(3L),
      "only the garbage-header file emits a failure row")
  }

  test("plant + parse stay narrow: no shuffle beyond the id fan-out, no " +
    "payload exchange") {
    val plan = Warc.parseWarc(Warc.plantWarcs(docs((0L until 8L).toSeq)))
      .queryExecution.executedPlan.toString
    // Exactly the one fan-out exchange from plantWarcs' fanOutIds.
    assert(plan.split("Exchange").length - 1 <= 1,
      s"extra shuffles in parse plan:\n$plan")
  }
}
