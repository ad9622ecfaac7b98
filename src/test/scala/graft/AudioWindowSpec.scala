package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AudioHash, Multimodal}

/** Sliding-window audio fingerprints + sub-clip containment: the
  * windowed kernel against an independent closed-form re-derivation
  * over the segment-grade planted corpus, the containment truth
  * (planted excerpts found, nothing else), cap semantics, geometry
  * edges, and the no-cartesian plan pin.
  */
class AudioWindowSpec extends AnyFunSuite {
  import SparkTestSession._

  private val Win = 130
  private val Hop = 26

  private def ids(n: Int) = {
    import spark.implicits._
    (0L until n.toLong).toDF("doc_id")
  }

  /** Independent re-derivation of the segment-grade corpus + windowed
    * bin rule, straight from the scaladocs — no AudioHash/Multimodal
    * internals.
    */
  private def refGeom(id: Long): (Long, Long, Int) = {
    val seg = id % 7 == 5
    val src = if (seg) id - 5 else id
    val off = if (seg) 26 * (1 + id % 4) else 0L
    val n = if (seg) 182 else (390 + id % 40).toInt
    (src, off, n)
  }

  private def refAmp(src: Long, f: Long): Long =
    math.abs((src * 31 + f * f * (13 + src % 89) + f * 57) % 4001L - 2000L)

  private def refWindowHash(src: Long, base: Long): Long = {
    val e = (0 until 65).map { b =>
      (refAmp(src, base + 2 * b) + refAmp(src, base + 2 * b + 1)) / 2
    }
    (0 until 64).foldLeft(0L) { (h, i) =>
      if (e(i) < e(i + 1)) h | (1L << i) else h
    }
  }

  test("windowed fingerprints over the segment-grade plant equal the " +
    "closed-form rule, offset arithmetic included (real decode vs pure " +
    "arithmetic)") {
    val got = AudioHash
      .windowFingerprints(Multimodal.plantWavsSeg(ids(30)), Win, Hop)
      .collect()
    assert(got.nonEmpty && got.forall(_.getBoolean(9)))
    got.foreach { r =>
      val id = r.getLong(0)
      val (src, off, n) = refGeom(id)
      assert(r.getInt(1) == n, s"n_frames id=$id")
      val nw = (n - Win) / Hop + 1
      assert(r.getInt(2) == nw, s"n_wins id=$id")
      val w = r.getInt(3)
      assert(r.getLong(4) == refWindowHash(src, off + w * Hop),
        s"whash id=$id w=$w")
    }
    // every clip emitted exactly n_wins rows
    val counts = got.groupBy(_.getLong(0)).view.mapValues(_.length)
    (0L until 30L).foreach { id =>
      val (_, _, n) = refGeom(id)
      assert(counts(id) == (n - Win) / Hop + 1, s"row count id=$id")
    }
  }

  test("containment finds exactly the planted excerpts: every segment id " +
    "(id % 7 = 5) is contained in id-5 at offset 1 + id % 4, full window " +
    "coverage, and NOTHING else matches (zero natural containments at " +
    "fixture scale)") {
    val pairs = AudioHash.containmentPairs(
      AudioHash.windowFingerprints(Multimodal.plantWavsSeg(ids(60)), Win, Hop))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(p => (p._1, p._2))
    val expected = (0L until 60L).filter(_ % 7 == 5)
      .map(id => (id, id - 5, 1 + id % 4, 3L)).sortBy(p => (p._1, p._2))
    assert(pairs.toSeq == expected,
      s"got ${pairs.mkString(",")} expected ${expected.mkString(",")}")
  }

  test("a segment never reports containment in an UNRELATED container, " +
    "and containers never report containment in each other (full-coverage " +
    "rule: 11+ windows can't all match)") {
    val pairs = AudioHash.containmentPairs(
      AudioHash.windowFingerprints(Multimodal.plantWavsSeg(ids(60)), Win, Hop))
      .collect()
    pairs.foreach { r =>
      assert(r.getLong(0) % 7 == 5 && r.getLong(1) == r.getLong(0) - 5)
    }
  }

  test("equal-length identical clips emit ONE direction (inner_id < " +
    "outer_id) with offset 0") {
    import spark.implicits._
    // two byte-identical clips = same waveform, full mutual containment
    val one = Multimodal.plantWavsSeg(ids(1)).select("media_id", "data")
    val dup = one.union(one.withColumn("media_id", col("media_id") + 100))
    val pairs = AudioHash
      .containmentPairs(AudioHash.windowFingerprints(dup, Win, Hop))
      .collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 0L && pairs(0).getLong(1) == 100L &&
      pairs(0).getLong(2) == 0L)
  }

  test("degenerate-hash cap: digital silence windows are dropped from " +
    "candidate generation (no silence-clique blowup), and the cap is a " +
    "no-op on the planted corpus") {
    import spark.implicits._
    // 20 silent clips: every window hash identical (all-zero energies)
    val silent = (0 until 20).map { i =>
      (1000L + i, Array.fill(Win + Hop * 2)(0))
    }
    val silentWav = silent.map { case (id, samples) =>
      val pcm = new Array[Byte](samples.length * 2)
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      (id, bos.toByteArray)
    }.toDF("media_id", "data")
    val wf = AudioHash.windowFingerprints(silentWav, Win, Hop)
    // 20 clips x 3 windows share one hash -> bucket 60 > cap 50 -> dropped
    assert(AudioHash.containmentPairs(wf, maxBucketSize = 50).count() == 0)
    // uncapped, the silent clips all mutually contain: pairs explode
    assert(AudioHash.containmentPairs(wf, maxBucketSize = Long.MaxValue)
      .count() > 0)
    // and on the planted corpus the default cap changes nothing
    val planted = AudioHash.windowFingerprints(
      Multimodal.plantWavsSeg(ids(40)), Win, Hop)
    assert(AudioHash.containmentPairs(planted).count() ==
      AudioHash.containmentPairs(planted, Long.MaxValue).count())
  }

  test("clips shorter than one window emit a single n_wins=0 row; corrupt " +
    "payloads degrade to decoded=false — neither kills the pass") {
    import spark.implicits._
    val shortClip = {
      val pcm = new Array[Byte](40 * 2)
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        8000f, 16, 1, 2, 8000f, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 40L)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, shortClip),
      (2L, Array[Byte](1, 2, 3)),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "data")
    val rows = AudioHash.windowFingerprints(df, Win, Hop)
      .collect().map(r => (r.getLong(0), r.getBoolean(9))).sorted
    assert(rows.toSeq == Seq((1L, true), (2L, false), (3L, false)))
    // and containment over that mess is simply empty, not an error
    assert(AudioHash.containmentPairs(
      AudioHash.windowFingerprints(df, Win, Hop)).count() == 0)
  }

  test("pair generation never goes cartesian: plan joins on the window " +
    "hash, no BroadcastNestedLoopJoin/CartesianProduct") {
    val plan = AudioHash.containmentPairs(
      AudioHash.windowFingerprints(Multimodal.plantWavsSeg(ids(10)), Win, Hop))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
