package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization: the pre-content-hash dedup key of every crawl
  * pipeline (the same page arrives as `HTTPS://WWW.Site.COM:443/a/?b=2&a=1`
  * and `https://site.com/a?a=1&b=2` — one fetch, one document). Rules are
  * the standard RFC 3986 §6 normalizations plus the crawl-specific ones:
  *
  *  - scheme + host lowercased; leading `www.` dropped
  *  - default port stripped (`:443` for https, `:80` for http); any other
  *    port kept
  *  - fragment dropped (never sent to the server)
  *  - trailing `/` stripped from the path (empty path → `/`)
  *  - query params: empties and `utm_*` tracking params dropped, the rest
  *    sorted bytewise and rejoined
  *
  * Everything is codegen'd `regexp_extract` / array built-ins — no UDFs,
  * no shuffle: canonicalization is a narrow per-row transform that fuses
  * into the scan at any scale. Planted inputs ([[plantUrls]]) are a pure
  * string function of the id, so a DuckDB oracle rebuilds the same messy
  * URL and canonicalizes it with its OWN regex/list engine — a
  * differential test of the full parse+normalize path (RE2 vs Java regex,
  * `list_sort` vs `array_sort`).
  */
object Urls {

  /** Deterministic messy URL per id: case-varied scheme/host, sometimes an
    * explicit default port, sometimes a trailing slash, params out of
    * order, sometimes `utm_*` tracking params, sometimes a fragment. Only
    * id mod small primes drive the variation, so collisions after
    * canonicalization occur naturally across a corpus (the dedup signal
    * p72 counts).
    */
  def plantUrls(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).as("id"), plantedUrl(col(idCol)).as("url"))

  /** The planted messy URL as a column expression of the id — exposed so
    * composite fixtures ([[Warc.plantWarcs]]) embed the SAME closed-form
    * URL without a second scan or a self-join.
    */
  def plantedUrl(id: Column): Column = {
    def s(c: Column): Column = c.cast("string")
    val scheme = when(id % 7 === 0, lit("HTTPS")).otherwise(lit("https"))
    val host = concat(lit("WWW.Site"), s(id % 13), lit(".Example.COM"))
    val port = when(id % 5 === 0, lit(":443")).otherwise(lit(""))
    val path = concat(lit("/cat"), s(id % 3), lit("/item"), s(id % 11),
      when(id % 4 === 0, lit("/")).otherwise(lit("")))
    val baseParams = when(id % 3 === 0, array(lit("b=2"), lit("a=1")))
      .when(id % 3 === 1, array(lit("a=1")))
      .otherwise(array().cast("array<string>"))
    val params = when(id % 9 === 0,
      concat(baseParams, array(lit("utm_source=x"), lit("utm_campaign=y"))))
      .otherwise(baseParams)
    val q = array_join(params, "&")
    val frag = when(id % 2 === 0, concat(lit("#sec"), s(id % 6)))
      .otherwise(lit(""))
    concat(scheme, lit("://"), host, port, path,
      when(length(q) > 0, concat(lit("?"), q)).otherwise(lit("")),
      frag)
  }

  /** Deterministic messy CRAWL-side image URL per image id — the
    * [[plantedUrl]] rule for the media records of the paired-crawl
    * fixture ([[Warc.plantPairedWarcs]]): case-varied scheme/host with
    * `www.`, sometimes the default port, sometimes a `utm_` tracking
    * param. Canonicalizes to
    * `https://site{id%13}.example.com/media/img{id}.png` — the SAME
    * canonical form as the page-side `<img src>` variant
    * ([[Html.plantedFigures]]), which is lowercase/no-www with port +
    * fragment: the pair join must go through [[canonicalize]], not
    * string equality.
    */
  def plantedImageUrl(id: Column): Column = {
    def s(c: Column): Column = c.cast("string")
    concat(
      when(id % 8 === 0, lit("HTTPS")).otherwise(lit("https")),
      lit("://WWW.Site"), s(id % 13), lit(".Example.COM"),
      when(id % 5 === 0, lit(":443")).otherwise(lit("")),
      lit("/media/img"), s(id), lit(".png"),
      when(id % 3 === 0, lit("?utm_source=x")).otherwise(lit("")))
  }

  /** [[plantedImageUrl]] for the crawl-side AUDIO records
    * ([[Warc.plantAudioPairedWarcs]]): same messy-variant discipline,
    * path `/media/clip{id}.wav`, canonicalizing to
    * `https://site{id%13}.example.com/media/clip{id}.wav` — the same
    * canonical key as the page-side `<audio src>` variant.
    */
  def plantedAudioUrl(id: Column): Column = {
    def s(c: Column): Column = c.cast("string")
    concat(
      when(id % 12 === 0, lit("HTTPS")).otherwise(lit("https")),
      lit("://WWW.Site"), s(id % 13), lit(".Example.COM"),
      when(id % 5 === 0, lit(":443")).otherwise(lit("")),
      lit("/media/clip"), s(id), lit(".wav"),
      when(id % 9 === 0, lit("?utm_source=x")).otherwise(lit("")))
  }

  /** [[plantedImageUrl]] for the crawl-side VIDEO records
    * ([[Warc.plantVideoPairedWarcs]]): same messy-variant discipline,
    * path `/media/anim{id}.gif`, canonicalizing to
    * `https://site{id%13}.example.com/media/anim{id}.gif` — the same
    * canonical key as the page-side `<video src>` / nested
    * `<source src>` variant ([[Html.plantedVideoFigures]]).
    */
  def plantedVideoUrl(id: Column): Column = {
    def s(c: Column): Column = c.cast("string")
    concat(
      when(id % 10 === 0, lit("HTTPS")).otherwise(lit("https")),
      lit("://WWW.Site"), s(id % 13), lit(".Example.COM"),
      when(id % 4 === 0, lit(":443")).otherwise(lit("")),
      lit("/media/anim"), s(id), lit(".gif"),
      when(id % 15 === 0, lit("?utm_source=x")).otherwise(lit("")))
  }

  /** Lowercased host with `www.` and any port stripped. */
  def hostOf(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val hostport =
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    regexp_replace(regexp_replace(lower(hostport), ":[0-9]+$", ""),
      "^www\\.", "")
  }

  /** Canonical form of a URL per the rules above. */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme =
      lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport =
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val host = regexp_replace(regexp_replace(lower(hostport), ":[0-9]+$", ""),
      "^www\\.", "")
    val keepPort = port =!= "" &&
      !(scheme === "https" && port === "443") &&
      !(scheme === "http" && port === "80")
    val rawPath = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // "/+$" not "/$": a real-corpus path ending in "//" must canonicalize
    // to no trailing slash in ONE pass, or canon(canon(u)) != canon(u) —
    // the idempotence invariant the property test pins (ADVICE r13).
    val stripped = regexp_replace(rawPath, "/+$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val qc = array_join(array_sort(filter(
      split(regexp_extract(noFrag, "\\?([^#]*)", 1), "&"),
      x => x =!= "" && !startswith(x, lit("utm_")))), "&")
    concat(scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      path,
      when(qc =!= "", concat(lit("?"), qc)).otherwise(lit("")))
  }

  /** Count of query params surviving canonicalization. */
  def keptParamCount(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    size(filter(split(regexp_extract(noFrag, "\\?([^#]*)", 1), "&"),
      x => x =!= "" && !startswith(x, lit("utm_"))))
  }

  /** Per-row canonical columns + the crawl-dedup signal: how many rows in
    * the corpus share each canonical URL. The window shuffles ONLY
    * (id, canon_url) — never page payloads — hash-partitioned on the
    * canonical key, the same layout a follow-up keep-first dedup reuses.
    */
  def withCanonical(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = col(urlCol)
    df.select(col(idCol).as("id"), u.as("url"),
        canonicalize(u).as("canon_url"),
        hostOf(u).as("host"),
        keptParamCount(u).as("n_params_kept"))
      .withColumn("n_dups",
        count(lit(1)).over(Window.partitionBy(col("canon_url"))))
  }
}
