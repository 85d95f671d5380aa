package graft.llmops

import org.apache.spark.sql.functions._
import graft.core.{Q, Tables => T}
import graft.functions.TextNormalize

/** Web-crawl text cleaning — the operators a Common-Crawl-shaped corpus
  * passes through before dedup/quality/tokenization: Unicode
  * normalization (so byte-level dedup sees one spelling per visible
  * string), HTML tag stripping + entity decoding, and URL structure
  * extraction for domain-level filtering and provenance.
  *
  * The fixture corpus is pure ASCII, so the normalization and HTML
  * queries first SYNTHESIZE the dirty input deterministically (inject
  * decomposed accents / wrap in markup) with the same expression on both
  * engines, then clean it back — the oracle proves the cleaning path,
  * not the synthesis.
  *
  * Scale posture: all three queries are pure per-row map work — no
  * shuffle at all before the output ORDER BY (which exists only for the
  * hash contract). Normalization runs as a native codegen'd expression
  * (graft.functions.UnicodeNormalize); tag stripping and entity decoding
  * are single-pass codegen'd regexp/replace chains.
  */
object WebClean {

  /** X — Unicode normalization: inject COMBINING ACUTE (U+0301) after
    * every 'a' (the decomposed spelling), then NFC-compose it back to
    * the precomposed 'á' and accent-fold it to plain ASCII. Oracle:
    * DuckDB `nfc_normalize` / `strip_accents`. Checks both the composed
    * string and the codepoint counts before/after (decomposed form is
    * one codepoint longer per accent on both engines).
    */
  val xNormalizeText = Q(
    "x_normalize_text",
    """WITH d AS (SELECT doc_id, replace(text, 'a', 'a' || chr(769)) AS dirty
                  FROM documents)
       SELECT doc_id,
              nfc_normalize(dirty) AS nfc,
              length(dirty) AS n_decomposed,
              length(nfc_normalize(dirty)) AS n_composed,
              strip_accents(nfc_normalize(dirty)) AS folded
       FROM d ORDER BY doc_id""") { (s, dir) =>
    // replacement is "a" + U+0301 COMBINING ACUTE (decomposed, two
    // codepoints) matching the oracle's `'a' || chr(769)`
    val dirty = regexp_replace(col("text"), "a", "á")
    T(s, dir, "documents")
      .select(col("doc_id"), dirty.as("dirty"))
      .select(col("doc_id"),
        TextNormalize.normalize(col("dirty"), "NFC").as("nfc"),
        length(col("dirty")).as("n_decomposed"),
        length(TextNormalize.normalize(col("dirty"), "NFC")).as("n_composed"),
        TextNormalize.stripAccents(
          TextNormalize.normalize(col("dirty"), "NFC")).as("folded"))
      .orderBy("doc_id")
  }

  /** X — HTML strip + entity decode: wrap each document in markup with
    * inline tags and entities, then strip tags with one regexp pass and
    * decode the four common entities. The identical replace chain runs
    * on both engines (order matters: `&amp;` decodes after `&nbsp;` but
    * before `&lt;`/`&gt;`, the standard last-amp rule shape).
    */
  val xHtmlStrip = Q(
    "x_html_strip",
    """WITH h AS (SELECT doc_id,
              '<html><body><h1>Doc</h1><p>' ||
              replace(text, 'the', '<b>the</b>') ||
              ' &amp; tail&nbsp;&lt;end&gt;</p></body></html>' AS html
            FROM documents),
       c AS (SELECT doc_id,
              replace(replace(replace(replace(
                regexp_replace(html, '<[^>]*>', '', 'g'),
                '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>') AS clean
             FROM h)
       SELECT doc_id, clean,
              CAST(len(string_split(clean, ' ')) AS BIGINT) AS n_words
       FROM c ORDER BY doc_id""") { (s, dir) =>
    val html = concat(
      lit("<html><body><h1>Doc</h1><p>"),
      regexp_replace(col("text"), "the", "<b>the</b>"),
      lit(" &amp; tail&nbsp;&lt;end&gt;</p></body></html>"))
    val stripped = regexp_replace(html, "<[^>]*>", "")
    val clean = Seq("&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<",
      "&gt;" -> ">").foldLeft(stripped) { case (c, (from, to)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(from), to)
    }
    T(s, dir, "documents")
      .select(col("doc_id"), clean.as("clean"))
      .select(col("doc_id"), col("clean"),
        size(split(col("clean"), " ")).cast("long").as("n_words"))
      .orderBy("doc_id")
  }

  /** X — URL structure extraction: build a provenance URL per document,
    * then parse host / path / query parameters back out. Spark side uses
    * the built-in `parse_url` (host/path/single-param extraction);
    * DuckDB has no URL parser, so the oracle spells the same extraction
    * with anchored regexps.
    */
  val xUrlParse = Q(
    "x_url_parse",
    """WITH u AS (SELECT doc_id,
              'https://' || source || '.example.com/' || lang || '/doc/' ||
              CAST(doc_id AS VARCHAR) || '?page=' || CAST(doc_id % 10 AS VARCHAR) ||
              '&ref=' || source AS url
            FROM documents)
       SELECT doc_id, url,
              regexp_extract(url, 'https?://([^/]+)', 1) AS host,
              regexp_extract(url, 'https?://[^/]+([^?]*)', 1) AS path,
              regexp_extract(url, 'page=([^&]*)', 1) AS page,
              regexp_extract(url, 'ref=([^&]*)', 1) AS ref
       FROM u ORDER BY doc_id""") { (s, dir) =>
    val url = concat(
      lit("https://"), col("source"), lit(".example.com/"), col("lang"),
      lit("/doc/"), col("doc_id").cast("string"),
      lit("?page="), (col("doc_id") % 10).cast("string"),
      lit("&ref="), col("source"))
    T(s, dir, "documents")
      .select(col("doc_id"), url.as("url"))
      .select(col("doc_id"), col("url"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("page")).as("page"),
        parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(xNormalizeText, xHtmlStrip, xUrlParse)
}
