package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One markdown chunk with its derived metadata — the Spark-native shape of
  * the reference's `Document(page_content, DocumentMeta)` (LangChain doc +
  * pydantic meta, /root/reference/src/rag/doc_processing.py:41-60).
  *
  * @param path          source file path (doc_url stand-in)
  * @param chunkIdx      0-based chunk position within the file
  * @param level         header level of the chunk (0 = preamble before any
  *                      header)
  * @param chunkTitle    last header on the stack (doc_processing.py:121);
  *                      filename stem fallback when no headers (:123-125)
  * @param enhancedTitle `" -> "`-joined header path (doc_processing.py:130)
  * @param docName       first H1 if present, else last subtitle, else
  *                      filename stem (doc_processing.py:123-128)
  * @param text          chunk body (header lines stripped, like the
  *                      reference's MarkdownHeaderTextSplitter)
  */
case class MdChunk(
    path: String,
    chunkIdx: Int,
    level: Int,
    chunkTitle: String,
    enhancedTitle: String,
    docName: String,
    text: String)

/** Markdown ingestion pipeline — SURVEY.md §2.1 S1–S5 re-expressed
  * Spark-first.
  *
  * The reference walks a doc tree with `os.walk`, keeps `.md`/`.mdx`
  * (src/common/file_path.py:8-18), drops paths matching any skip regex
  * (doc_processing.py:254-264), splits each file on ATX headers into ≤
  * `maxChunkSize`-char chunks (doc_processing.py:63-158) and derives
  * chunk metadata (doc_processing.py:112-132). Here:
  *
  *   - the directory walk is Spark's `wholetext` text source with
  *     `recursiveFileLookup` — file listing is distributed and the content
  *     read is lazy, so a million-file corpus lists on the driver but reads
  *     on executors;
  *   - extension / skip-pattern predicates are Catalyst `filter`s on
  *     `input_file_name` — they prune *before* chunking work;
  *   - the header chunker is a `flatMap` over `Dataset[(path, content)]`:
  *     one task per file split, no shuffle — chunking parallelism equals
  *     read parallelism, which is exactly right at 100 TB (each file is
  *     independent);
  *   - setext→ATX normalization (S5, src/tools/convert_headings.py:18-81)
  *     is a pure column regex pre-pass.
  */
object MarkdownIngest {

  /** default max chunk size, chars (doc_processing.py:25) */
  val DefaultMaxChunkSize = 4096

  private val HeaderRe = "^(#{1,6})\\s+(.*?)\\s*$".r

  // ---- S1: recursive scan + F1/F2 predicates --------------------------

  /** Recursive scan of `baseDir` for markdown files.
    * Returns (path, content) rows; `limit`=0 means unlimited (F7,
    * doc_processing.py:220-226).
    *
    * Extension pruning happens at LISTING time (`pathGlobFilter`): a
    * non-markdown file — including large binaries living in the doc
    * tree — is never opened, not read-then-dropped. The case-insensitive
    * `isMarkdownPath` filter stays as a correctness belt (glob
    * matching is case-sensitive, so the glob covers the common casings
    * and the filter guarantees the contract). */
  def scan(
      spark: SparkSession,
      baseDir: String,
      skipPatterns: Seq[String] = Nil,
      limit: Int = 0): DataFrame = {
    val raw = spark.read
      .option("wholetext", "true")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter",
        "*.{md,mD,Md,MD,mdx,mdX,mDx,mDX,Mdx,MdX,MDx,MDX}")
      .text(baseDir)
      .select(input_file_name().as("path"), col("value").as("content"))
    val md = raw.filter(isMarkdownPath(col("path")))
    val skipped = skipPatterns.foldLeft(md)((df, p) =>
      df.filter(!col("path").rlike(p)))
    if (limit > 0) skipped.limit(limit) else skipped
  }

  /** F1: keep `.md`/`.mdx`, case-insensitive (file_path.py:8-18). */
  def isMarkdownPath(path: Column): Column = {
    val lp = lower(path)
    lp.endsWith(".md") || lp.endsWith(".mdx")
  }

  // ---- S5: setext → ATX heading normalization -------------------------

  /** `Title\n====` → `# Title`, `Title\n----` → `## Title`
    * (convert_headings.py:18-81, two multiline regex passes). Patterns are
    * deliberately RE2-compatible (no lookahead) so the DuckDB oracle can
    * run the identical regex; `.+` (not `.*`) keeps blank lines above
    * `---` horizontal rules from matching. */
  def normalizeSetext(content: Column): Column = {
    val h1 = regexp_replace(content, "(?m)^(.+)\\n=+[ \\t]*$", "# $1")
    regexp_replace(h1, "(?m)^(.+)\\n-+[ \\t]*$", "## $1")
  }

  // ---- S2/S3/S4: header chunker + oversize split + metadata -----------

  /** Pure chunker for one file: split on ATX headers (6 levels), maintain
    * the header stack, strip header lines from bodies, split oversize
    * chunks by ceil-division (doc_processing.py:135-158), and derive
    * chunk/doc titles (doc_processing.py:112-132). Pure function of its
    * arguments — safe to distribute, easy to property-test. */
  def chunkMarkdown(
      path: String,
      content: String,
      maxChunkSize: Int = DefaultMaxChunkSize): Seq[MdChunk] = {
    val fileStem = {
      val base = path.split('/').last
      val dot = base.lastIndexOf('.')
      if (dot > 0) base.substring(0, dot) else base
    }

    // split into (headerStack, bodyLines) sections
    val sections = scala.collection.mutable.ArrayBuffer.empty[(List[(Int, String)], StringBuilder)]
    var stack: List[(Int, String)] = Nil // innermost first
    sections += ((stack, new StringBuilder))
    for (line <- content.split("\n", -1)) line match {
      case HeaderRe(hashes, title) =>
        val level = hashes.length
        stack = (level, title) :: stack.dropWhile(_._1 >= level)
        sections += ((stack, new StringBuilder))
      case other =>
        val sb = sections.last._2
        if (sb.nonEmpty) sb.append('\n')
        sb.append(other)
    }

    val chunks = sections.iterator
      .map { case (st, sb) => (st.reverse, sb.result().trim) }
      .filter { case (st, body) => body.nonEmpty || st.nonEmpty }
      .flatMap { case (st, body) =>
        // S3: oversize split, ceil-division into equal-count slices
        if (body.length <= maxChunkSize) Iterator((st, body))
        else {
          val n = (body.length + maxChunkSize - 1) / maxChunkSize
          (0 until n).iterator.map(i =>
            (st, body.substring(i * maxChunkSize,
              math.min((i + 1) * maxChunkSize, body.length))))
        }
      }
      .zipWithIndex
      .map { case ((st, body), idx) =>
        val titles = st.map(_._2)
        val chunkTitle = titles.lastOption.getOrElse(fileStem)
        val enhanced =
          if (titles.isEmpty) fileStem else titles.mkString(" -> ")
        val docName = st.find(_._1 == 1).map(_._2)
          .orElse(titles.lastOption).getOrElse(fileStem)
        MdChunk(path, idx, st.lastOption.map(_._1).getOrElse(0),
          chunkTitle, enhanced, docName, body)
      }
      .toVector

    // a file with no headers and no content still yields one empty-doc
    // marker in the reference (it iterates the splitter's output, which is
    // empty) — we return no chunks for a fully-empty file.
    chunks.filter(c => c.text.nonEmpty || c.level > 0)
  }

  /** Distributed chunker: (path, content) rows → MdChunk rows via flatMap.
    * Narrow transformation — no shuffle; each file chunks inside its own
    * task. */
  def chunk(
      files: DataFrame,
      maxChunkSize: Int = DefaultMaxChunkSize): Dataset[MdChunk] = {
    val spark = files.sparkSession
    import spark.implicits._
    files.select("path", "content").as[(String, String)]
      .flatMap { case (p, c) => chunkMarkdown(p, c, maxChunkSize) }
  }

  /** End-to-end S1→S4: scan + normalize + chunk. */
  def ingest(
      spark: SparkSession,
      baseDir: String,
      skipPatterns: Seq[String] = Nil,
      maxChunkSize: Int = DefaultMaxChunkSize,
      limit: Int = 0): Dataset[MdChunk] = {
    val files = scan(spark, baseDir, skipPatterns, limit)
      .withColumn("content", normalizeSetext(col("content")))
    chunk(files, maxChunkSize)
  }
}
