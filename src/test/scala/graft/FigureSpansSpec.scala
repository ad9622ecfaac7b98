package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.Html

/** The shared-figure-spans path (r19, p157/p142-family): the full-HTML
  * `<figure>` splitter runs once via [[Html.figureSpans]] and each
  * modality's back half runs on the exploded snippets. Every
  * `*TextPairsFrom(figureSpans(pages))` must compute exactly the rows of
  * the corresponding one-shot `*TextPairs(pages)` — the two paths share
  * the same back-half code by delegation, and this spec pins that the
  * split front half didn't change what reaches it.
  */
class FigureSpansSpec extends AnyFunSuite {
  import SparkTestSession._

  private def pages = {
    import spark.implicits._
    Seq(
      // one page with all three modality figures, figcaption + alt forms
      (1L,
        """<html><body>
          |<figure><img src="http://a/x.png" alt="alt text here"></figure>
          |<figure><audio src="http://a/y.wav"></audio>
          |<figcaption>audio cap words</figcaption></figure>
          |<figure><video><source src="http://a/z.mp4"></video>
          |<figcaption>vid cap words</figcaption></figure>
          |<figure><img src="http://a/w.png">
          |<figcaption>fig caption beats alt</figcaption></figure>
          |</body></html>""".stripMargin),
      // a page with no figures at all
      (2L, "<html><body>plain text only</body></html>")
    ).toDF("page_id", "html")
  }

  private def media(url: String*) = {
    import spark.implicits._
    url.zipWithIndex.map { case (u, i) => (i.toLong, u, i % 2 == 0) }
      .toDF("m_id", "m_url", "decoded")
  }

  test("imageTextPairsFrom(figureSpans) == imageTextPairs, audio and " +
    "video likewise, including fig_idx numbering across mixed figures") {
    val m = media("http://a/x.png", "http://a/w.png", "http://a/y.wav",
      "http://a/z.mp4")
    val spans = Html.figureSpans(pages, "page_id", "html")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("page_id"), col("fig_idx"))
        .collect().map(_.toString).toSeq
    assert(rows(Html.imageTextPairsFrom(spans, m, "m_id", "m_url", "decoded"))
      == rows(Html.imageTextPairs(pages, "page_id", "html",
           m, "m_id", "m_url", "decoded")))
    assert(rows(Html.audioTextPairsFrom(spans, m, "m_id", "m_url", "decoded"))
      == rows(Html.audioTextPairs(pages, "page_id", "html",
           m, "m_id", "m_url", "decoded")))
    assert(rows(Html.videoTextPairsFrom(spans, m, "m_id", "m_url", "decoded"))
      == rows(Html.videoTextPairs(pages, "page_id", "html",
           m, "m_id", "m_url", "decoded")))
    // sanity: the mixed page routes each figure to exactly one modality
    // with page-wide fig_idx preserved (0=img, 1=audio, 2=video, 3=img)
    val img = Html.imageTextPairsFrom(spans, m, "m_id", "m_url", "decoded")
      .select("fig_idx").collect().map(_.getInt(0)).sorted
    assert(img.toSeq == Seq(0, 3), s"image figures routed wrong: ${img.toSeq}")
  }
}
