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

  /** X — URL canonicalization dedup: the crawl-frontier / provenance
    * dedup that catches what byte-level dedup can't see — the SAME page
    * addressed four ways. Each document synthesizes one of four dirty
    * variants of its group's URL (uppercase host + explicit default
    * port + trailing slash + utm tracking param / unordered params /
    * fragment / already-clean), and canonicalization must collapse
    * every group:
    *
    *   1. strip the fragment
    *   2. lowercase scheme://host[:port] (path case is preserved)
    *   3. drop the scheme-default port (:443)
    *   4. drop tracking (utm_*) query params
    *   5. sort surviving params by key
    *   6. strip the trailing path slash
    *
    * Graded output: per canonical URL, the variant count and the
    * representative (min doc_id) — the crawl-dedup survivor rule.
    * Pure per-row string map + one hash agg; every step is the same
    * string/HOF expression on both engines.
    */
  val xUrlCanon = Q(
    "x_url_canon",
    """WITH u AS (SELECT doc_id,
              CASE doc_id % 4
                WHEN 0 THEN 'https://WWW.Site' || CAST(doc_id // 4 AS VARCHAR) ||
                  '.Example.COM:443/articles/item/?id=' || CAST(doc_id // 4 AS VARCHAR) ||
                  '&utm_source=feed'
                WHEN 1 THEN 'https://www.site' || CAST(doc_id // 4 AS VARCHAR) ||
                  '.example.com/articles/item?utm_campaign=x&id=' || CAST(doc_id // 4 AS VARCHAR)
                WHEN 2 THEN 'https://www.site' || CAST(doc_id // 4 AS VARCHAR) ||
                  '.example.com/articles/item?id=' || CAST(doc_id // 4 AS VARCHAR) ||
                  '#section-2'
                ELSE 'https://www.site' || CAST(doc_id // 4 AS VARCHAR) ||
                  '.example.com/articles/item?id=' || CAST(doc_id // 4 AS VARCHAR)
              END AS url
            FROM documents),
       s1 AS (SELECT doc_id, string_split(url, '#')[1] AS base FROM u),
       s2 AS (SELECT doc_id,
                regexp_replace(lower(regexp_extract(base, '^(https?://[^/?]+)', 1)),
                  ':443$', '') AS auth,
                regexp_extract(base, '^https?://[^/?]+([^?]*)', 1) AS path,
                CASE WHEN strpos(base, '?') > 0
                     THEN substr(base, strpos(base, '?') + 1) ELSE '' END AS q
              FROM s1),
       s3 AS (SELECT doc_id, auth,
                CASE WHEN path <> '/' AND path LIKE '%/'
                     THEN substr(path, 1, len(path) - 1) ELSE path END AS path,
                array_to_string(list_sort(list_filter(string_split(q, '&'),
                  p -> NOT starts_with(p, 'utm_') AND p <> '')), '&') AS pq
              FROM s2),
       c AS (SELECT doc_id,
               auth || path || CASE WHEN pq <> '' THEN '?' || pq ELSE '' END AS canon
             FROM s3)
       SELECT canon, CAST(count(*) AS BIGINT) AS n_variants,
              CAST(min(doc_id) AS BIGINT) AS rep_doc
       FROM c GROUP BY canon ORDER BY canon""") { (s, dir) =>
    val g = expr("doc_id div 4").cast("string")
    val url = when(col("doc_id") % 4 === 0, concat(
        lit("https://WWW.Site"), g, lit(".Example.COM:443/articles/item/?id="),
        g, lit("&utm_source=feed")))
      .when(col("doc_id") % 4 === 1, concat(
        lit("https://www.site"), g, lit(".example.com/articles/item?utm_campaign=x&id="), g))
      .when(col("doc_id") % 4 === 2, concat(
        lit("https://www.site"), g, lit(".example.com/articles/item?id="),
        g, lit("#section-2")))
      .otherwise(concat(
        lit("https://www.site"), g, lit(".example.com/articles/item?id="), g))
    T(s, dir, "documents")
      .select(col("doc_id"), url.as("url"))
      .withColumn("base", split(col("url"), "#").getItem(0))
      .withColumn("auth", regexp_replace(
        lower(regexp_extract(col("base"), "^(https?://[^/?]+)", 1)),
        ":443$", ""))
      .withColumn("path0",
        regexp_extract(col("base"), "^https?://[^/?]+([^?]*)", 1))
      .withColumn("path",
        when(col("path0") =!= "/" && col("path0").endsWith("/"),
          expr("substring(path0, 1, length(path0) - 1)"))
          .otherwise(col("path0")))
      .withColumn("q", when(instr(col("base"), "?") > 0,
        expr("substring(base, instr(base, '?') + 1)")).otherwise(lit("")))
      .withColumn("pq", array_join(array_sort(filter(split(col("q"), "&"),
        p => !p.startsWith("utm_") && p =!= "")), "&"))
      .select(col("doc_id"), concat(col("auth"), col("path"),
        when(col("pq") =!= "", concat(lit("?"), col("pq")))
          .otherwise(lit(""))).as("canon"))
      .groupBy(col("canon"))
      .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("rep_doc"))
      .orderBy("canon")
  }

  val all: Seq[Q] = Seq(xNormalizeText, xHtmlStrip, xUrlParse, xUrlCanon)
}
