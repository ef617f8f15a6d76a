package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → visible text extraction — the first transform every web-crawl
  * training pipeline applies before any quality/dedup pass. Deliberately a
  * FIXED, documented regex chain (not a browser-grade parser): each step
  * is a single `regexp_replace` in the Java ∩ RE2 regex subset, so the
  * whole operator is one narrow codegen'd projection (zero shuffles,
  * streaming-safe) AND byte-for-byte reproducible by a SQL oracle — the
  * [[UrlNorm]] discipline.
  *
  * The chain, in order (order is semantic — entity decoding must run
  * after tag stripping, and `&amp;` LAST so `&amp;lt;` decodes to the
  * literal `&lt;` and never to `<`):
  *
  *  1. drop `<script>…</script>` and `<style>…</style>` blocks
  *     (case-insensitive, dot-matches-newline, lazy) — their content is
  *     code, not text
  *  2. drop `<!-- … -->` comments
  *  3. every remaining tag `<[^>]*>` becomes ONE space (a separator, so
  *     `…</td><td>…` never glues words)
  *  4. decode the core entities: `&nbsp;` → space, `&lt;` `&gt;` `&quot;`
  *     `&#39;`/`&apos;` → their characters, then `&amp;` → `&`
  *  5. collapse whitespace runs to one space and trim
  *
  * Malformed HTML degrades deterministically and identically in both
  * engines: a bare `<` with a later `>` parses as one tag (the text
  * between them goes); a `<` with no following `>` stays verbatim. For
  * text fidelity beyond this contract (tables, RTL, soft hyphens) plug a
  * real parser behind the same column signature.
  */
object HtmlText {

  /** The visible text of `html` per the documented chain.
    *
    * The five entity decodes (step 4) are LITERAL patterns — no regex
    * metacharacters — so they run through `replace` (StringReplace, a
    * plain substring scan) instead of `regexp_replace`: byte-identical
    * output (both substitute every non-overlapping occurrence left to
    * right), but the codegen'd loop skips the regex engine entirely.
    * The four structural steps and the whitespace collapse genuinely
    * need regex and stay `regexp_replace`.
    */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ent1 = replace(noTags, lit("&nbsp;"), lit(" "))
    val ent2 = replace(ent1, lit("&lt;"), lit("<"))
    val ent3 = replace(ent2, lit("&gt;"), lit(">"))
    val ent4 = replace(ent3, lit("&quot;"), lit("\""))
    val ent5 = replace(ent4, lit("&#39;"), lit("'"))
    val ent6 = replace(ent5, lit("&apos;"), lit("'"))
    val ent7 = replace(ent6, lit("&amp;"), lit("&"))
    trim(regexp_replace(ent7, "\\s+", " "))
  }

  /** Append `textField` (default `text_extracted`) plus the extracted
    * length — the usual pre-filter signal (near-empty pages drop first).
    */
  def htmlToText(df: org.apache.spark.sql.DataFrame, htmlCol: String,
      outCol: String = "text_extracted"): org.apache.spark.sql.DataFrame =
    df.withColumn(outCol, extractText(col(htmlCol)))
      .withColumn(s"${outCol}_chars", length(col(outCol)).cast("long"))
}
