package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → training-text extraction (the trafilatura/jusText class of
  * pipeline step, reduced to a deterministic, engine-portable spec).
  * Web-crawl corpora arrive as markup; the model should train on the
  * rendered prose, not `<script>` payloads and nav chrome.
  *
  * The extraction pipeline, in spec order (every stage is a codegen'd
  * builtin — regexp_replace / split / transform / filter / array_join —
  * so a 100 TB pass is one embarrassingly parallel projection over the
  * scan, zero shuffles, zero UDFs):
  *   1. drop `<!-- … -->` comments, then `<script>…</script>` and
  *      `<style>…</style>` blocks wholesale (case-insensitive, dotall);
  *   2. block-level tags (p/div/br/li/ul/ol/h1-6/tr/table/section/
  *      article/header/footer/blockquote) become line breaks — they are
  *      the visual paragraph boundaries;
  *   3. every remaining tag becomes a space (inline tags do not break
  *      lines);
  *   4. the six core entities decode, in fixed order: nbsp → space,
  *      lt, gt, quot, #39, amp last (so `&amp;lt;` decodes once, to
  *      `&lt;` — single-pass semantics, documented not recursive);
  *   5. per line: whitespace runs collapse to one space, trim, and
  *      lines shorter than `minLineChars` are dropped — the length
  *      floor is the boilerplate filter (nav crumbs, button labels,
  *      copyright lines are short; prose is not).
  *
  * The same chain is expressible verbatim in ANSI/DuckDB SQL
  * (regexp_replace 'gis' + list_transform/list_filter), which is what
  * the driver's oracle runs — the spec IS the contract, so the two
  * engines agree byte-for-byte.
  */
object HtmlExtract {

  private val blockTags =
    "p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|footer|blockquote"

  /** The tag-level rewrite (stages 1-4): markup out, entities decoded,
    * block boundaries as '\n'. Exposed separately so callers can apply
    * their own line policy. */
  def stripTags(html: Column): Column = {
    val noComment = regexp_replace(html, "(?is)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val blocks = regexp_replace(noStyle, s"(?i)</?(?:$blockTags)\\b[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", " ")
    Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
        "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
  }

  /** Full extraction (stages 1-5): cleaned lines ≥ `minLineChars`,
    * rejoined with '\n'. */
  def extractText(html: Column, minLineChars: Int = 10): Column = {
    val lines = split(stripTags(html), "\n")
    val cleaned = transform(lines, l => trim(regexp_replace(l, "\\s+", " ")))
    val kept = filter(cleaned, l => length(l) >= lit(minLineChars))
    array_join(kept, "\n")
  }

  /** Per-document extraction report: (id, content, n_lines, n_chars). */
  def extract(df: DataFrame, idCol: String, htmlCol: String,
              minLineChars: Int = 10): DataFrame = {
    val content = extractText(col(htmlCol), minLineChars)
    df.select(col(idCol), content.as("content"))
      .withColumn("n_lines",
        when(length(col("content")) === 0, lit(0L))
          .otherwise(size(split(col("content"), "\n")).cast("long")))
      .withColumn("n_chars", length(col("content")).cast("long"))
  }
}
