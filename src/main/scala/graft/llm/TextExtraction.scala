package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markup → training-text extraction — the web-corpus front door of
  * every published pretraining pipeline (CCNet, C4, RefinedWeb strip
  * HTML before any quality/dedup stage runs).
  *
  * Design: a fixed chain of codegen'd `regexp_replace` kernels over
  * the Java∩RE2 regex subset, so the DuckDB oracle can replay the
  * EXACT transform and hash-match the output. No DOM parse — at
  * 100 TB the per-row cost budget is one linear scan per pattern, and
  * the published pipelines accept the same approximation (C4 strips
  * tags with regexes too). All stages stay inside whole-stage codegen:
  * zero shuffles, row-parallel to any cluster width.
  *
  * Stage order matters and is part of the contract:
  *  1. drop <script>/<style>/<!-- --> CONTAINERS (content AND tags —
  *     their text is code, not prose);
  *  2. block-level closers/openers (</p>, <br>, </div>, </li>, </h1-6>,
  *     </tr>) become newlines so sentence structure survives;
  *  3. every remaining tag is deleted;
  *  4. the 5 XML named entities + &nbsp; + decimal numeric refs decode;
  *  5. whitespace normalizes (runs of spaces/tabs collapse, ≥3 newlines
  *     collapse to 2, edges trim).
  */
object TextExtraction {

  /** Strip one category of container element, tags included. `(?is)`:
    * case-insensitive + dot-matches-newline — both flags exist in Java
    * and RE2 with identical semantics. Non-greedy body keeps one
    * container from swallowing the document. */
  private def dropContainer(c: Column, tag: String): Column =
    regexp_replace(c, s"(?is)<$tag\\b[^>]*>.*?</$tag>", "")

  /** HTML/markup → plain text. */
  def stripMarkup(html: Column): Column = {
    val noScript = dropContainer(dropContainer(html, "script"), "style")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", "")
    val blocks = regexp_replace(noComment,
      "(?i)</(?:p|div|li|h[1-6]|tr|blockquote)>|<br\\s*/?>", "\n")
    val noTags = regexp_replace(blocks, "(?s)<[^>]*>", "")
    val entities = decodeEntities(noTags)
    // whitespace normalization: horizontal runs → one space, then
    // space-padded newlines tighten, then ≥3 newlines → paragraph break
    val ws1 = regexp_replace(entities, "[ \\t]+", " ")
    val ws2 = regexp_replace(ws1, " ?\\n ?", "\n")
    val ws3 = regexp_replace(ws2, "\\n{3,}", "\n\n")
    trim(ws3)
  }

  /** Decode the named entities every HTML document uses plus decimal
    * numeric character references. `&amp;` decodes LAST so literal
    * `&amp;lt;` round-trips as `&lt;` (double-encoding preserved),
    * matching spec-conformant decoders on this entity set. */
  def decodeEntities(c: Column): Column = {
    val nbsp = regexp_replace(c, "&nbsp;", " ")
    val lt = regexp_replace(nbsp, "&lt;", "<")
    val gt = regexp_replace(lt, "&gt;", ">")
    val quot = regexp_replace(gt, "&quot;", "\"")
    val apos = regexp_replace(quot, "&#0*39;|&apos;", "'")
    regexp_replace(apos, "&amp;", "&")
  }

  /** Accent/diacritic stripping — the text-normalization sibling of
    * [[decodeEntities]] (search keys, dedup keys and langid features
    * usually fold diacritics). Spelled as NFD + drop-combining-marks
    * (`\p{Mn}`), which is exactly the semantics DuckDB's independent
    * `strip_accents` implements (verified: precomposed letters with a
    * combining decomposition fold — café→cafe, ḡ→g — while atomic
    * letters like ø and ł survive). Both stages are codegen'd
    * (`unicode_normalize` is the engine's native kernel). */
  def stripAccents(c: Column): Column =
    regexp_replace(call_function("unicode_normalize", c, lit("NFD")),
      "\\p{Mn}", "")

  /** Extracted-text yield audit: how much of the raw byte volume
    * survives extraction, per row. The standard corpus-triage signal
    * (boilerplate-heavy hosts yield near 0). */
  def extractionYield(html: Column): Column = {
    val out = length(stripMarkup(html))
    when(length(html) > 0, out.cast("double") / length(html).cast("double"))
      .otherwise(lit(0.0))
  }
}
