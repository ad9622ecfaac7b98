package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Html, Urls}

class HtmlSpec extends AnyFunSuite {
  import SparkTestSession._

  private def oneDoc(id: Long, text: String) = {
    import spark.implicits._
    Seq((id, text)).toDF("doc_id", "text")
  }

  test("plantHtml -> htmlToText: scripts/styles vanish, entities decode, " +
    "content and chrome text survive in page order") {
    val planted = Html.plantHtml(
      oneDoc(7L, "alpha beta gamma delta"), "doc_id", "text")
    val Array(row) = Html.pageFeatures(planted, "id", "html").collect()
    val text = row.getAs[String]("text")
    // Script body text (`var d=7`, `track`) must NOT leak into the text.
    assert(!text.contains("var d"), s"script leaked: $text")
    assert(!text.contains("track("), s"script leaked: $text")
    assert(!text.contains("color:#000"), s"style leaked: $text")
    // Entities decode exactly once, AFTER tag stripping.
    assert(text.contains("doc 7 & heading <x>"), s"entities wrong: $text")
    // Title, nav chrome, content and footer text all present, in order.
    val expected = "doc 7 " + // title
      "nav item 0 nav item 1 nav item 2 nav item 3 " + // nav (7%4+1 = 4)
      "doc 7 & heading <x> " + // h1
      "alpha beta gamma delta " + // the single paragraph
      "privacy policy terms of use & contact" // footer
    assert(text == expected, s"got: $text")
    // Counts: 4 nav + 1 footer*3 anchors... footer has 3 anchors; no
    // anchored paragraph for id=7, i=0 ((7+0)%5 != 0).
    assert(row.getAs[Int]("n_links") == 7)
    assert(row.getAs[Long]("anchor_chars") ==
      4 * "nav item N".length + "privacy policy".length +
        "terms of use".length + "contact".length)
  }

  test("entity decode is single-pass: &amp;lt; yields literal &lt;, not <") {
    import spark.implicits._
    val out = Seq("a &amp;lt; b").toDF("s")
      .select(Html.decodeEntities(col("s")).as("d"))
      .collect()(0).getString(0)
    assert(out == "a &lt; b", s"double-decoded: $out")
  }

  test("blockExtract keeps content, drops link-dense chrome and fragments") {
    // id=0: paragraph i=0 has (0+0)%5==0 -> first word anchored. The
    // anchored CONTENT paragraph must still be kept (low link density).
    val planted = Html.plantHtml(
      oneDoc(0L, "alpha beta gamma delta epsilon"), "doc_id", "text")
    val Array(row) = Html.blockExtract(planted, "id", "html").collect()
    // Blocks: nav, h1, 1 paragraph, footer = 4.
    assert(row.getAs[Int]("n_blocks") == 4)
    // Kept: h1 + paragraph. Nav (density 1.0) and footer (density ~.89)
    // dropped.
    assert(row.getAs[Int]("n_kept") == 2)
    assert(row.getAs[String]("main_text") ==
      "doc 0 & heading <x> alpha beta gamma delta epsilon")
  }

  test("blockExtract drops a >=3-word block when one huge anchored word " +
    "dominates (density rule, not just word count)") {
    import spark.implicits._
    // Hand-built page: 3 words, anchor covers 8/12 non-space chars...
    // density = 8*1e6/14 > 0.5 -> dropped; the plain twin is kept.
    val html = "<p><a href=\"/x\">abcdefgh</a> i j</p><p>abcdefgh i j</p>"
    val df = Seq((1L, html)).toDF("id", "html")
    val Array(row) = Html.blockExtract(df, "id", "html").collect()
    assert(row.getAs[Int]("n_blocks") == 2)
    assert(row.getAs[Int]("n_kept") == 1)
    assert(row.getAs[String]("main_text") == "abcdefgh i j")
  }

  test("block/anchor tag names are boundary-anchored: <pre>/<param> do not " +
    "open p-blocks, bare <a> anchors still count (ADVICE r13)") {
    import spark.implicits._
    // Without the name boundary, `<pre>` would open a "p" block that lazily
    // closes at the first `</p>` — swallowing the code AND mis-counting the
    // real paragraph. With the fix: exactly one block, the real <p>.
    val html = "<pre>code; not prose</pre>" +
      "<param name=\"x\"><picture>pic</picture>" +
      "<p>real content paragraph here</p>"
    val Array(b) = Html.blockExtract(
      Seq((1L, html)).toDF("id", "html"), "id", "html").collect()
    assert(b.getAs[Int]("n_blocks") == 1, s"mis-segmented: $b")
    assert(b.getAs[String]("main_text") == "real content paragraph here")
    // Bare `<a>` (no attributes) and newline-separated attributes both
    // count as anchors for n_links and anchor_chars.
    val html2 = "<p><a>bare</a> and <a\nhref=\"/x\">multi line</a> words</p>"
    val Array(f) = Html.pageFeatures(
      Seq((2L, html2)).toDF("id", "html"), "id", "html").collect()
    assert(f.getAs[Int]("n_links") == 2, s"anchors missed: $f")
    assert(f.getAs[Long]("anchor_chars") == "bare".length + "multi line".length)
  }

  test("malformed HTML degrades, never throws: truncation, stray angle " +
    "brackets, unclosed script") {
    import spark.implicits._
    val planted = Html.plantHtml(oneDoc(3L, "alpha beta gamma"),
      "doc_id", "text").collect()(0).getAs[String]("html")
    val cases = Seq(
      planted.take(planted.length / 2), // truncated mid-page
      planted.replace("</script>", ""), // unclosed script eats the page
      "<<<>>><p>ok</p><", // stray brackets
      "", // empty
      "no html at all", // plain text
      planted.updated(10, '<')) // bit-flip-ish corruption
    val df = cases.zipWithIndex.map { case (h, i) => (i.toLong, h) }
      .toDF("id", "html")
    // Both operators must complete; outputs are strings/ints (degraded is
    // fine, absent/NULL text is not).
    val feats = Html.pageFeatures(df, "id", "html").collect()
    assert(feats.length == cases.length)
    assert(feats.forall(_.getAs[String]("text") != null))
    val blocks = Html.blockExtract(df, "id", "html").collect()
    assert(blocks.length == cases.length)
    assert(blocks.forall(_.getAs[Int]("n_kept") <= blocks.maxBy(
      _.getAs[Int]("n_blocks")).getAs[Int]("n_blocks")))
    // Stray-bracket garbage around well-formed content: content survives.
    assert(feats.find(_.getAs[Long]("id") == 2L).get
      .getAs[String]("text").contains("ok"))
  }

  test("seeded mutation fuzz: 200 corrupted pages (byte flips, splices, " +
    "truncations) all degrade, never throw, and keep invariants") {
    import spark.implicits._
    val base = Html.plantHtml(oneDoc(42L, "alpha beta gamma delta epsilon " +
      "zeta eta theta iota kappa lambda mu nu xi"), "doc_id", "text")
      .collect()(0).getAs[String]("html")
    val rnd = new scala.util.Random(20260815L)
    val mutants = (0 until 200).map { i =>
      val sb = new StringBuilder(base)
      rnd.nextInt(3) match {
        case 0 => // flip 1-5 chars to random printable/angle chars
          (0 until 1 + rnd.nextInt(5)).foreach { _ =>
            sb.setCharAt(rnd.nextInt(sb.length),
              "<>&;\"abc0 ".charAt(rnd.nextInt(10)))
          }
        case 1 => // truncate at a random point
          sb.setLength(1 + rnd.nextInt(sb.length - 1))
        case 2 => // splice a random fragment of the page into itself
          val from = rnd.nextInt(sb.length)
          val len = rnd.nextInt(math.min(40, sb.length - from))
          sb.insert(rnd.nextInt(sb.length),
            sb.substring(from, from + len))
      }
      (i.toLong, sb.toString)
    }
    val df = mutants.toDF("id", "html")
    val feats = Html.pageFeatures(df, "id", "html").collect()
    assert(feats.length == 200)
    feats.foreach { r =>
      assert(r.getAs[String]("text") != null, s"null text for id ${r.get(0)}")
      assert(r.getAs[Int]("text_chars") >= 0)
      assert(r.getAs[Long]("ld_micro") >= 0)
    }
    val blocks = Html.blockExtract(df, "id", "html").collect()
    assert(blocks.length == 200)
    blocks.foreach { r =>
      assert(r.getAs[Int]("n_kept") <= r.getAs[Int]("n_blocks"),
        s"kept > blocks for id ${r.get(0)}")
      assert(r.getAs[String]("main_text") != null)
    }
  }

  test("plantHtml + extraction stay one narrow codegen'd stage: no shuffle") {
    val planted = Html.plantHtml(oneDoc(1L, "a b c"), "doc_id", "text")
    val plan = Html.pageFeatures(planted, "id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    val plan2 = Html.blockExtract(planted, "id", "html")
      .queryExecution.executedPlan.toString
    assert(!plan2.contains("Exchange"), s"unexpected shuffle:\n$plan2")
  }

  test("urls: canonicalization rules, one by one") {
    import spark.implicits._
    val cases = Seq(
      // case + www + default port + trailing slash + fragment
      "HTTPS://WWW.Example.COM:443/a/b/#frag" -> "https://example.com/a/b",
      // http default port
      "http://example.com:80/x" -> "http://example.com/x",
      // NON-default port kept
      "https://example.com:8443/x" -> "https://example.com:8443/x",
      // param sort + utm strip + empty param
      "https://example.com/p?z=1&utm_source=t&a=2&" ->
        "https://example.com/p?a=2&z=1",
      // bare host -> "/" path
      "https://Example.com" -> "https://example.com/",
      // MULTIPLE trailing slashes all strip in one pass (idempotence off
      // the planted set — ADVICE r13)
      "https://example.com/a//" -> "https://example.com/a",
      "https://example.com///" -> "https://example.com/",
      // all params stripped -> no "?"
      "https://example.com/p?utm_a=1&utm_b=2" -> "https://example.com/p")
    val df = cases.map(_._1).toDF("url")
      .select(col("url"), Urls.canonicalize(col("url")).as("canon"))
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"canon($in) = ${got(in)}, want $want")
    }
  }

  test("urls: canonical invariants hold over 500 randomized component " +
    "combinations (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13L)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    val urls = (0 until 500).map { i =>
      val scheme = pick(Seq("http", "HTTP", "https", "HTTPS", "hTTps"))
      val www = pick(Seq("", "www.", "WWW."))
      val host = www + pick(Seq("ex.com", "EX.com", "a-b.Example.ORG"))
      val port = pick(Seq("", ":80", ":443", ":8080", ":9"))
      val path = pick(Seq("", "/", "/a", "/a/b", "/a/b/", "/UPPER/Case",
        "/a//", "//"))
      val params = (0 until rnd.nextInt(4)).map(_ =>
        pick(Seq("a=1", "b=2", "z=9", "utm_source=x", "utm_x=y", "")))
      val q = if (params.isEmpty) "" else "?" + params.mkString("&")
      val frag = pick(Seq("", "#f", "#sec/2?x=1"))
      (i.toLong, s"$scheme://$host$port$path$q$frag")
    }
    val df = urls.toDF("id", "url")
      .select(col("id"), col("url"), Urls.canonicalize(col("url")).as("c"))
      .select(col("id"), col("url"), col("c"),
        Urls.canonicalize(col("c")).as("cc"))
    df.collect().foreach { r =>
      val (u, c, cc) = (r.getString(1), r.getString(2), r.getString(3))
      assert(c == cc, s"not idempotent: $u -> $c -> $cc")
      assert(!c.contains("#"), s"fragment survived: $u -> $c")
      val hostOut = c.split("://")(1).takeWhile(ch => ch != '/' && ch != '?')
      val hostNoPort = hostOut.takeWhile(_ != ':')
      assert(hostNoPort == hostNoPort.toLowerCase, s"host case: $u -> $c")
      assert(!hostNoPort.startsWith("www."), s"www survived: $u -> $c")
      // Default-port stripping is SCHEME-AWARE: :80 is default only for
      // http (it is a real, non-default port on https — kept), :443 only
      // for https.
      val schemeOut = c.takeWhile(_ != ':')
      val defPort = if (schemeOut == "http") ":80" else ":443"
      assert(!hostOut.endsWith(defPort),
        s"default port survived: $u -> $c")
      if (c.contains("?")) {
        val ps = c.split("\\?")(1).split("&").toSeq
        assert(ps.forall(_.nonEmpty) && !ps.exists(_.startsWith("utm_")),
          s"bad params: $u -> $c")
        assert(ps == ps.sorted, s"params unsorted: $u -> $c")
      }
      // Path: root stays "/", otherwise no trailing slash.
      val afterHost = c.split("://")(1).dropWhile(ch => ch != '/' && ch != '?')
      val pathOut = afterHost.takeWhile(_ != '?')
      assert(pathOut == "/" || !pathOut.endsWith("/"),
        s"trailing slash survived: $u -> $c")
    }
  }

  test("urls: garbage inputs degrade, never throw") {
    import spark.implicits._
    val junk = Seq("", "not a url", "http//missing.colon/x", "://nohost",
      "https://", "ftp://weird:port:8/x?&&&#", "https://h?#",
      "https://h:99999999999999999999/x")
    val out = junk.toDF("url")
      .select(Urls.canonicalize(col("url")).as("c"), Urls.hostOf(col("url")))
      .collect()
    assert(out.length == junk.length)
    assert(out.forall(_.getString(0) != null))
  }

  test("urls: canonicalization is idempotent over the planted corpus") {
    import spark.implicits._
    val ids = (0L until 500L).toDF("doc_id")
    val planted = Urls.plantUrls(ids, "doc_id")
    val twice = planted.select(
      Urls.canonicalize(col("url")).as("c1"))
      .select(col("c1"), Urls.canonicalize(col("c1")).as("c2"))
      .filter(col("c1") =!= col("c2"))
    assert(twice.count() == 0, "canon(canon(u)) must equal canon(u)")
  }

  test("p73 web funnel narrows monotonically per host, and every stage " +
    "cuts something corpus-wide") {
    val rows = graft.SparkEntry.queries("p73_web_curation")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (u, c, q, f) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      assert(u >= c && c >= q && q >= f && f > 0, s"funnel not monotone: $r")
    }
    def tot(i: Int) = rows.map(_.getLong(i)).sum
    assert(tot(1) > tot(2), "URL dedup must collapse some canonical groups")
    assert(tot(2) > tot(3), "quality gate must drop some docs")
    assert(tot(3) > tot(4), "content fingerprint must collapse some dups")
  }

  test("imageFigures: figcaption caption with entity decode, alt " +
    "fallback, attribute-bearing tags, figureless pages emit nothing") {
    import spark.implicits._
    val pages = Seq(
      (1L, "<html><body><p>x</p>" +
        "<figure><img src=\"https://a.com/i1.png\" alt=\"a1\">" +
        "<figcaption>cap &amp; one <b>bold</b></figcaption></figure>" +
        "<figure class=\"z\"><img src=\"https://a.com/i2.png\" " +
        "alt=\"alt two words\"></figure>" +
        "</body></html>"),
      (2L, "<html><body><p>no figures here</p></body></html>"))
      .toDF("page_id", "html")
    val got = Html.imageFigures(pages, "page_id", "html")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getInt(4))).sortBy(x => (x._1, x._2)).toSeq
    assert(got == Seq(
      (1L, 0, "https://a.com/i1.png", "cap & one bold", 4),
      (1L, 1, "https://a.com/i2.png", "alt two words", 3)), s"got $got")
  }

  test("imageTextPairs: join lands only through canonicalization, " +
    "unresolved references get image_id -1, gate at 3 words") {
    import spark.implicits._
    val pages = Seq(
      (1L, "<html><body>" +
        // messy page-side src; image record uses a DIFFERENT messy form
        "<figure><img src=\"https://WWW.a.com:443/i.png#t\" alt=\"x\">" +
        "<figcaption>a good caption here</figcaption></figure>" +
        // reference that resolves to no crawl image
        "<figure><img src=\"https://b.com/miss.png\" alt=\"y\">" +
        "<figcaption>another fine caption</figcaption></figure>" +
        // resolves, but alt-only (1 word) -> fails the gate
        "<figure><img src=\"https://c.com/j.png\" alt=\"solo\"></figure>" +
        "</body></html>"))
      .toDF("page_id", "html")
    val images = Seq(
      (100L, "HTTPS://a.com/i.png?utm_source=z", true),
      (101L, "https://c.com/j.png", false))
      .toDF("image_id", "img_url", "decoded")
    val got = Html.imageTextPairs(pages, "page_id", "html",
        images, "image_id", "img_url", "decoded")
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getString(3),
        r.getString(4), r.getBoolean(6), r.getBoolean(7))).sortBy(_._1).toSeq
    assert(got == Seq(
      (0, 100L, "a good caption here", "unknown", true, true),
      (1, -1L, "another fine caption", "unknown", true, false),
      (2, 101L, "solo", "unknown", false, false)), s"got $got")
  }

  test("planted figures: page-side src and crawl-side image URL " +
    "canonicalize to the SAME key, and blockExtract is unchanged by " +
    "figure insertion") {
    import spark.implicits._
    val ids = Seq(4L, 8L, 12L).toDF("id")
    val both = ids.select(
      Urls.canonicalize(
        concat(lit("https://site"), (col("id") % 13).cast("string"),
          lit(".example.com:443/media/img"), col("id").cast("string"),
          lit(".png#thumb"))).as("page_side"),
      Urls.canonicalize(Urls.plantedImageUrl(col("id"))).as("crawl_side"))
      .collect()
    both.foreach(r => assert(r.getString(0) == r.getString(1),
      s"canon mismatch: ${r.getString(0)} vs ${r.getString(1)}"))
    val doc = oneDoc(7L, (1 to 30).map(i => s"w$i").mkString(" "))
    val plain = Html.blockExtract(
      doc.select(col("doc_id"),
        Html.plantedPage(col("doc_id"), col("text")).as("html")),
      "doc_id", "html").collect()(0)
    val figured = Html.blockExtract(
      doc.select(col("doc_id"),
        Html.plantedPageWithFigures(col("doc_id"), col("text")).as("html")),
      "doc_id", "html").collect()(0)
    assert(plain.getAs[String]("main_text") ==
      figured.getAs[String]("main_text"),
      "figure blocks must be invisible to blockExtract")
  }

  test("audioFigures: no alt fallback, mixed-modality pages route each " +
    "figure to exactly its modality's extractor") {
    import spark.implicits._
    val pages = Seq(
      (1L, "<html><body>" +
        "<figure><img src=\"https://a.com/i.png\" alt=\"img alt words\">" +
        "</figure>" +
        "<figure><audio src=\"https://a.com/c.wav\"></audio>" +
        "<figcaption>a clip caption here</figcaption></figure>" +
        "<figure><audio src=\"https://a.com/d.wav\"></audio></figure>" +
        "</body></html>"))
      .toDF("page_id", "html")
    val imgs = Html.imageFigures(pages, "page_id", "html")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3)))
      .toSeq
    assert(imgs == Seq((0, "https://a.com/i.png", "img alt words")),
      s"imgs: $imgs")
    val auds = Html.audioFigures(pages, "page_id", "html")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3),
        r.getInt(4))).sortBy(_._1).toSeq
    // fig_idx is the page-wide figure position (1 and 2 here); the
    // caption-less audio figure has NO alt fallback -> empty, 0 words.
    assert(auds == Seq(
      (1, "https://a.com/c.wav", "a clip caption here", 4),
      (2, "https://a.com/d.wav", "", 0)), s"auds: $auds")
  }

  test("videoFigures: direct src, nested <source> fallback, poster " +
    "never mistaken for src, and cross-modality figures drop out") {
    import spark.implicits._
    val pages = Seq(
      (1L, "<html><body>" +
        // direct src + poster BEFORE it (poster must not win)
        "<figure><video poster=\"/th.png\" src=\"https://a.com/v1.gif\">" +
        "</video><figcaption>ein clip und mehr</figcaption></figure>" +
        // nested <source>, no src attribute on <video> at all
        "<figure><video controls><source src=\"https://a.com/v2.gif\" " +
        "type=\"video/gif\"></video></figure>" +
        // poster-only video (no src anywhere) -> drops out
        "<figure><video poster=\"/only.png\"></video></figure>" +
        // an image figure -> not a video figure
        "<figure><img src=\"https://a.com/i.png\" alt=\"alt words\">" +
        "</figure>" +
        "</body></html>"))
      .toDF("page_id", "html")
    val vids = Html.videoFigures(pages, "page_id", "html")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3),
        r.getInt(4))).sortBy(_._1).toSeq
    assert(vids == Seq(
      (0, "https://a.com/v1.gif", "ein clip und mehr", 4),
      (1, "https://a.com/v2.gif", "", 0)), s"vids: $vids")
    // the image figure still routes to the image extractor only
    val imgs = Html.imageFigures(pages, "page_id", "html")
      .collect().map(r => (r.getInt(1), r.getString(2))).toSeq
    assert(imgs == Seq((3, "https://a.com/i.png")), s"imgs: $imgs")
  }

  test("planted video figures: page-side src (both markup parities) and " +
    "crawl-side clip URL canonicalize to the SAME key") {
    import spark.implicits._
    // id%3==2 pages: 2 (even -> direct src), 5 (odd -> nested <source>)
    val pages = Seq(2L, 5L).toDF("id")
      .select(col("id"),
        Html.plantedPageWithVideoFigures(col("id"),
          lit((1 to 30).map(i => s"w$i").mkString(" "))).as("html"))
    val figs = Html.videoFigures(pages, "id", "html")
      .select(col("page_id"),
        Urls.canonicalize(col("src")).as("page_canon"))
    // the figure of page id targets clip id - id%5 + 5
    val crawl = Seq(2L -> 5L, 5L -> 10L).toDF("page_id", "tgt")
      .select(col("page_id"),
        Urls.canonicalize(Urls.plantedVideoUrl(col("tgt"))).as("crawl_canon"))
    val joined = figs.join(crawl, Seq("page_id")).collect()
    assert(joined.length == 2)
    joined.foreach { r =>
      assert(r.getAs[String]("page_canon") == r.getAs[String]("crawl_canon"),
        s"canon mismatch on page ${r.getLong(0)}: " +
          s"${r.getAs[String]("page_canon")} vs " +
          s"${r.getAs[String]("crawl_canon")}")
    }
  }

  test("interleavedDoc: document order is preserved with figures " +
    "BETWEEN paragraphs, gates drop chrome and srcless figures, and " +
    "the surviving sequence renumbers densely") {
    import spark.implicits._
    val pages = Seq(
      (1L, "<html><body>" +
        "<nav><a href=\"/a\">nav one</a><a href=\"/b\">nav two</a></nav>" +
        "<p>first paragraph with plenty of words here</p>" +
        "<figure><img src=\"https://a.com/1.png\" alt=\"x\"></figure>" +
        "<p>second paragraph also has words</p>" +
        "<figure><video src=\"https://a.com/v.gif\"></video></figure>" + // no <img> -> dropped
        "<p>tiny</p>" + // < 3 words -> dropped
        "<figure><img src=\"https://a.com/2.png\"></figure>" +
        "<footer><a href=\"/p\">privacy</a></footer>" +
        "</body></html>"))
      .toDF("page_id", "html")
    val got = Html.interleavedDoc(pages, "page_id", "html")
      .collect().map(r => (r.getInt(1), r.getString(2), r.getString(3),
        r.getInt(4))).sortBy(_._1).toSeq
    assert(got == Seq(
      (0, "text", "first paragraph with plenty of words here", 7),
      (1, "image", "https://a.com/1.png", 0),
      (2, "text", "second paragraph also has words", 5),
      (3, "image", "https://a.com/2.png", 0)), s"got $got")
  }

  test("urls: planted corpus produces real post-canonicalization dup " +
    "groups (the crawl-dedup signal)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val ids = (0L until 500L).toDF("doc_id")
    val out = Urls.withCanonical(Urls.plantUrls(ids, "doc_id"), "id", "url")
    assert(out.filter(col("n_dups") > 1).count() > 0,
      "planting must produce canonical collisions")
    // Every member of a dup group shares the canonical URL but may differ
    // in raw URL — i.e. the dups are non-trivial.
    val grouped = out.groupBy(col("canon_url"))
      .agg(countDistinct(col("url")).as("raw_variants"),
        count(lit(1)).as("n"))
      .filter(col("n") > 1 && col("raw_variants") > 1)
    assert(grouped.count() > 0,
      "dup groups must contain DIFFERENT raw spellings of one URL")
  }
}
