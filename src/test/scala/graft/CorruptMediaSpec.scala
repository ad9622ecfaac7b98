package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Mp4Meta, Multimodal}

/** Corrupt-payload fuzz over every real-codec path: at 100 TB the
  * realistic corruption is a payload TRUNCATED mid-stream (partial
  * upload, torn object) or bit-flipped in the body — valid magic bytes,
  * broken interior — which is a different failure mode from the
  * "no reader claims it" junk the other specs cover. Contract under
  * test: the job NEVER fails; every output row is well-formed; a decode
  * either succeeds with sane bounds or degrades to `decoded=false`; the
  * resize/resample transforms either produce output or pass the row
  * through — never fabricate.
  */
class CorruptMediaSpec extends AnyFunSuite {
  import SparkTestSession._

  private def docs(n: Int) = {
    import SparkTestSession.spark.implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  /** Truncate to `frac` of the payload (keeps the magic bytes), or flip a
    * mid-body byte — deterministic per id so failures reproduce. */
  private def corrupt(media: org.apache.spark.sql.DataFrame) = {
    val mangle = udf { (id: Long, data: Array[Byte]) =>
      if (data == null || data.length < 8) data
      else if (id % 2 == 0) data.take(math.max(8, (data.length * 6) / 10))
      else {
        val c = data.clone()
        val pos = 8 + (id % (c.length - 8)).toInt
        c(pos) = (c(pos) ^ 0x5A).toByte
        c
      }
    }
    media.withColumn("data", mangle(col("media_id"), col("data")))
  }

  test("truncated/bit-flipped GIFs: sample, resize, motion all complete " +
      "with well-formed rows") {
    val bad = corrupt(Multimodal.plantGifs(docs(16)))
    val sampled = Multimodal.sampleVideoFrames(bad, 1).collect()
    assert(sampled.nonEmpty)
    sampled.foreach { r =>
      if (r.getBoolean(7)) {
        // A prefix of frames may survive truncation — bounds must be sane.
        val id = r.getLong(0)
        assert(r.getInt(3) <= 3 + (id % 4).toInt, "more frames than planted")
        assert(r.getInt(4) == 8 + (id % 5).toInt &&
          r.getInt(5) == 10 + (id % 3).toInt)
        assert(r.getLong(6) >= 0)
      } else assert(r.isNullAt(2) && r.isNullAt(6))
    }
    // Resize: output row per input, each either re-encoded or passthrough.
    val resized = Multimodal.resizeVideoPooled(bad, 2).collect()
    assert(resized.length == 16)
    resized.foreach(r => assert(!r.isNullAt(2), "payload must never vanish"))
    // Motion: completes; decoded rows carry non-negative sums.
    val motion = Multimodal.videoMotionFeatures(bad).collect()
    motion.foreach(r => if (r.getBoolean(4)) assert(r.getLong(3) >= 0))
  }

  test("truncated/bit-flipped WAVs: decode + resample complete, " +
      "passthrough preserved") {
    val bad = corrupt(Multimodal.plantWavs(docs(16)))
    val decoded = Multimodal.decodeAudioFeatures(bad).collect()
    assert(decoded.length == 16)
    decoded.foreach { r =>
      if (r.getBoolean(6)) {
        val id = r.getLong(0)
        // javax.sound trusts the fmt header; frames must not exceed planted.
        assert(r.getLong(4) <= (64 + (id % 32)).toLong)
      } else assert(r.isNullAt(4))
    }
    val resampled = Multimodal.resampleAudioDecimated(bad, 2).collect()
    assert(resampled.length == 16)
    resampled.foreach(r => assert(!r.isNullAt(2)))
  }

  test("truncated/bit-flipped 16-bit WAVs: decode + per-channel resample " +
      "complete, passthrough preserved") {
    val bad = corrupt(Multimodal.plantWavs16(docs(16)))
    val decoded = Multimodal.decodeAudioFeatures(bad).collect()
    assert(decoded.length == 16)
    decoded.foreach { r =>
      if (r.getBoolean(6)) {
        val id = r.getLong(0)
        // Header-declared frame count must never exceed the planted one.
        assert(r.getLong(4) <= (48 + (id % 16)).toLong)
      } else assert(r.isNullAt(4))
    }
    val resampled = Multimodal.resampleAudioDecimated(bad, 2).collect()
    assert(resampled.length == 16)
    resampled.foreach(r => assert(!r.isNullAt(2), "payload must never vanish"))
  }

  test("truncated/bit-flipped MP4s: box walk completes with well-formed " +
      "rows") {
    val bad = corrupt(Mp4Meta.plantMp4s(docs(16)))
    val parsed = Mp4Meta.parseMp4Meta(bad).collect()
    assert(parsed.length == 16)
    parsed.foreach { r =>
      if (r.getBoolean(5)) {
        // Whatever metadata survived the mangle must stay structurally
        // sane: positive timescale, non-negative duration/track count.
        assert(r.getInt(2) > 0)
        if (!r.isNullAt(1)) assert(r.getLong(1) >= 0)
        assert(r.getInt(3) >= 0 && r.getInt(3) <= 3)
      } else assert(r.isNullAt(1) && r.isNullAt(2))
    }
  }

  test("truncated/bit-flipped PNGs: decode + pooled resize complete") {
    val bad = corrupt(Multimodal.plantPngs(docs(16)))
    val decoded = Multimodal.decodeImageFeatures(bad).collect()
    assert(decoded.length == 16)
    decoded.foreach { r =>
      if (!r.getBoolean(6)) assert(r.isNullAt(2) && r.isNullAt(5))
    }
    val resized = Multimodal.resizePooled(bad, 2).collect()
    assert(resized.length == 16)
    resized.foreach(r => assert(!r.isNullAt(2)))
  }
}
