package graft.queries

import org.apache.spark.sql.functions._
import graft.llm.TextExtraction

/** Markup-extraction operator queries. The documents corpus is plain
  * text, so each query MINTS a deterministic HTML wrapping (entities
  * encoded, containers injected) and the operator must recover clean
  * prose — the oracle replays both the minting and the strip chain in
  * DuckDB (regexp_replace with 'g' + inline (?is) flags over the
  * Java∩RE2 subset), so a hash match certifies every stage.
  */
object ExtractionQueries {

  /** Deterministic HTML minting shared by query and oracle: entity-
    * encode the text, then wrap with script/style/comment containers,
    * headings, paragraph breaks and a per-doc attr-laden tag. */
  private val mintSpark: org.apache.spark.sql.Column = {
    val enc = regexp_replace(
      regexp_replace(regexp_replace(col("text"), "&", "&amp;"), "<", "&lt;"), ">", "&gt;")
    concat(
      lit("<html><head><title>doc</title><style type=\"text/css\">p { color: #333; }\n.x{}</style>"),
      lit("<script>if (1 < 2) { var s = \"</p>\"; }</script></head>\n<body>"),
      lit("<!-- id "), col("doc_id"), lit(" -->"),
      lit("<h1>Doc "), col("doc_id"), lit("</h1>"),
      lit("<div class=\"main\" data-src=\""), col("source"), lit("\">"),
      lit("<p>"), substring(enc, 1, 80), lit("</p>"),
      lit("<p>Tom &amp; Jerry &#39;quoted&#39; &quot;x&quot; &nbsp; tail</p>"),
      lit("<ul><li>"), col("lang"), lit("</li></ul>"),
      lit("<p>"), substring(enc, 81, 1000000), lit("</p>"),
      lit("</div><br></body></html>"))
  }

  private def mintDuck(text: String): String = {
    val enc = s"replace(replace(replace($text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    "'<html><head><title>doc</title><style type=\"text/css\">p { color: #333; }' || chr(10) || '.x{}</style>' || " +
      "'<script>if (1 < 2) { var s = \"</p>\"; }</script></head>' || chr(10) || '<body>' || " +
      "'<!-- id ' || doc_id || ' -->' || " +
      "'<h1>Doc ' || doc_id || '</h1>' || " +
      "'<div class=\"main\" data-src=\"' || source || '\">' || " +
      s"'<p>' || substr($enc, 1, 80) || '</p>' || " +
      "'<p>Tom &amp; Jerry &#39;quoted&#39; &quot;x&quot; &nbsp; tail</p>' || " +
      "'<ul><li>' || lang || '</li></ul>' || " +
      s"'<p>' || substr($enc, 81, 1000000) || '</p>' || " +
      "'</div><br></body></html>'"
  }

  /** The strip chain in DuckDB, stage for stage (global 'g' flag —
    * DuckDB's regexp_replace is first-match-only by default). */
  private def stripDuck(h: String): String = {
    var c = h
    def rr(pat: String, repl: String): Unit =
      c = s"regexp_replace($c, '$pat', '$repl', 'g')"
    rr("(?is)<script\\b[^>]*>.*?</script>", "")
    rr("(?is)<style\\b[^>]*>.*?</style>", "")
    rr("(?s)<!--.*?-->", "")
    rr("(?i)</(?:p|div|li|h[1-6]|tr|blockquote)>|<br\\s*/?>", "\n")
    rr("(?s)<[^>]*>", "")
    rr("&nbsp;", " ")
    rr("&lt;", "<")
    rr("&gt;", ">")
    rr("&quot;", "\"")
    rr("&#0*39;|&apos;", "''")
    rr("&amp;", "&")
    rr("[ \\t]+", " ")
    rr(" ?\\n ?", "\n")
    rr("\\n{3,}", "\n\n")
    s"trim($c)"
  }

  val queries: Map[String, Q.QFn] = Map(
    "q_text_extract" -> ((s, dir) =>
      Q.t(s, dir, "documents")
        .where(col("doc_id") < 400)
        .select(col("doc_id"),
          md5(TextExtraction.stripMarkup(mintSpark)).as("clean_md5"),
          length(TextExtraction.stripMarkup(mintSpark)).cast("long").as("clean_len"))),

    "q_extract_yield" -> ((s, dir) =>
      Q.t(s, dir, "documents")
        .where(col("doc_id") < 400)
        .select(col("doc_id"),
          // floor-grid the ratio: both engines divide exact ints, grid
          // kills any last-ulp double divergence
          floor(TextExtraction.extractionYield(mintSpark) * 10000)
            .cast("long").as("yield_bp"))),

    // Accent folding vs DuckDB's INDEPENDENT strip_accents: mint
    // diacritics by letter translation (all chosen letters carry
    // combining-mark decompositions), strip, md5-compare. Stripping
    // the minted text restores the original — len equality pins that.
    "q_fn_accents" -> ((s, dir) => {
      val minted = translate(col("text"), "aeiounc", "áèïôůñç")
      Q.t(s, dir, "documents")
        .where(col("doc_id") < 400)
        .select(col("doc_id"),
          md5(minted).as("minted_md5"),
          md5(TextExtraction.stripAccents(minted)).as("strip_md5"),
          (length(TextExtraction.stripAccents(minted)) === length(col("text")))
            .as("len_roundtrip"))
    }))

  def oracle: Map[String, String] = {
    val stripped = stripDuck(mintDuck("text"))
    Map(
      "q_text_extract" ->
        s"""SELECT doc_id, md5($stripped) AS clean_md5,
           |  CAST(length($stripped) AS BIGINT) AS clean_len
           |FROM documents WHERE doc_id < 400""".stripMargin,
      "q_fn_accents" ->
        """SELECT doc_id,
          |  md5(translate(text, 'aeiounc', 'áèïôůñç')) AS minted_md5,
          |  md5(strip_accents(translate(text, 'aeiounc', 'áèïôůñç'))) AS strip_md5,
          |  length(strip_accents(translate(text, 'aeiounc', 'áèïôůñç')))
          |    = length(text) AS len_roundtrip
          |FROM documents WHERE doc_id < 400""".stripMargin,
      "q_extract_yield" ->
        s"""SELECT doc_id,
           |  CAST(floor(CASE WHEN length(${mintDuck("text")}) > 0
           |    THEN CAST(length($stripped) AS DOUBLE) / length(${mintDuck("text")})
           |    ELSE 0.0 END * 10000) AS BIGINT) AS yield_bp
           |FROM documents WHERE doc_id < 400""".stripMargin)
  }
}
