package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables
import graft.operators.{Mp4Meta, Multimodal}

class Mp4MetaSpec extends AnyFunSuite {
  import SparkTestSession._

  test("plantMp4s -> parseMp4Meta: box walk matches the rule for both " +
      "mvhd versions") {
    val docs = Tables.load(spark, sf01, "documents").limit(20)
    val planted = Mp4Meta.plantMp4s(docs)
    // The payload is genuine ISO-BMFF structure: ftyp first.
    val bytes = planted.select("data").head().getAs[Array[Byte]](0)
    assert(new String(bytes.slice(4, 8), "US-ASCII") == "ftyp")
    val parsed = Mp4Meta.parseMp4Meta(planted)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(parsed.size == 20)
    parsed.foreach { case (id, r) =>
      val ts = 500 + (id % 4).toInt * 250
      val dur = 10000L + id % 90000L
      val nt = 1 + (id % 3).toInt
      assert(r.getBoolean(5), s"media $id must parse")
      assert(r.getLong(1) == dur * 1000L / ts, s"duration_ms mismatch for $id")
      assert(r.getInt(2) == ts && r.getInt(3) == nt)
      val codecs = (0 until nt)
        .map(t => if ((id + t) % 2 == 0) "avc1" else "mp4a").mkString(",")
      assert(r.getString(4) == codecs, s"codecs mismatch for $id")
    }
  }

  /** Hand-build a stream exercising the walker paths plantMp4s doesn't:
    * 64-bit largesize headers and size=0 (extends-to-parent-end) boxes.
    */
  test("walker handles largesize (size=1) and size=0 boxes") {
    import SparkTestSession.spark.implicits._
    def box(fourcc: String, body: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + body.length)
      bb.putInt(8 + body.length).put(fourcc.getBytes("US-ASCII")).put(body)
      bb.array()
    }
    val mvhdBody = java.nio.ByteBuffer.allocate(100)
    mvhdBody.put(Array[Byte](0, 0, 0, 0)).putInt(0).putInt(0)
      .putInt(600).putInt(1234)
    val mvhd = box("mvhd", mvhdBody.array())
    // moov with a LARGESIZE header (size field = 1, 64-bit size follows).
    val moovLarge = {
      val bb = java.nio.ByteBuffer.allocate(16 + mvhd.length)
      bb.putInt(1).put("moov".getBytes("US-ASCII"))
        .putLong(16L + mvhd.length).put(mvhd)
      bb.array()
    }
    val largeRow = moovLarge
    // moov with size=0: extends to the end of the stream.
    val moovZero = {
      val bb = java.nio.ByteBuffer.allocate(8 + mvhd.length)
      bb.putInt(0).put("moov".getBytes("US-ASCII")).put(mvhd)
      bb.array()
    }
    val df = Seq((1L, largeRow), (2L, moovZero))
      .toDF("media_id", "data")
    val out = Mp4Meta.parseMp4Meta(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    Seq(1L, 2L).foreach { id =>
      val r = out(id)
      assert(r.getBoolean(5), s"stream $id must parse")
      assert(r.getInt(2) == 600 && r.getLong(1) == 1234L * 1000 / 600)
      assert(r.getInt(3) == 0 && r.isNullAt(4)) // no traks planted here
    }
  }

  test("adversarial size fields terminate: oversized, undersized, zero-len " +
      "payloads degrade without throwing") {
    import SparkTestSession.spark.implicits._
    def be(i: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).putInt(i).array()
    val cases = Seq(
      // declared size far beyond the payload
      1L -> (be(0x7FFFFFFF) ++ "moov".getBytes("US-ASCII") ++ new Array[Byte](16)),
      // size smaller than its own header (corrupt; must not loop)
      2L -> (be(3) ++ "moov".getBytes("US-ASCII") ++ new Array[Byte](16)),
      // largesize header with a negative 64-bit size
      3L -> {
        val bb = java.nio.ByteBuffer.allocate(32)
        bb.putInt(1).put("moov".getBytes("US-ASCII")).putLong(-5L)
        bb.array()
      },
      4L -> Array.emptyByteArray,
      5L -> "not an mp4 at all".getBytes("US-ASCII"))
    val out = Mp4Meta.parseMp4Meta(cases.toDF("media_id", "data")).collect()
    assert(out.length == cases.length)
    out.foreach { r =>
      assert(!r.getBoolean(5), s"junk stream ${r.getLong(0)} must not parse")
      assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    }
  }

  test("adversarial deep nesting (100k nested containers) degrades at the " +
      "depth cap instead of blowing the stack") {
    import SparkTestSession.spark.implicits._
    // 100,000 nested size=0 `moov` boxes: without the MaxDepth cap the
    // walker recurses once per level and dies with StackOverflowError —
    // an Error the parse-side `catch Exception` does NOT absorb, i.e. a
    // dead task on a real fleet. With the cap it returns a sane
    // unparsed row.
    val nested = {
      val n = 100000
      val bytes = new Array[Byte](8 * n)
      val bb = java.nio.ByteBuffer.wrap(bytes)
      (0 until n).foreach { _ =>
        bb.putInt(0).put("moov".getBytes("US-ASCII")) // size=0: to parent end
      }
      bytes
    }
    val out = Mp4Meta.parseMp4Meta(Seq((1L, nested)).toDF("media_id", "data"))
      .collect()
    assert(out.length == 1)
    assert(!out(0).getBoolean(5), "deep-nested junk must not parse")
  }

  test("minParallelism fans a narrow mp4 table out before the parse") {
    val target = spark.sparkContext.defaultParallelism
    val narrow = Mp4Meta
      .plantMp4s(Tables.load(spark, sf01, "documents").limit(64)).coalesce(1)
    val fanned = Mp4Meta.parseMp4Meta(narrow, minParallelism = target)
    assert(fanned.rdd.getNumPartitions == target)
    assert(Mp4Meta.parseMp4Meta(narrow).rdd.getNumPartitions == 1)
  }
}
