package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MarkdownIngestSpec extends SparkSpec {

  private val corpusDir = getClass.getResource("/corpus").getPath

  // ---- pure chunker (S2/S3/S4) ----------------------------------------

  test("chunker splits on headers and maintains the header-path stack") {
    val md =
      """# Title
        |intro body
        |## Section A
        |a body
        |### Sub A1
        |a1 body
        |## Section B
        |b body""".stripMargin
    val chunks = MarkdownIngest.chunkMarkdown("/docs/x.md", md)
    assert(chunks.map(_.chunkTitle) ==
      Seq("Title", "Section A", "Sub A1", "Section B"))
    assert(chunks.map(_.enhancedTitle) == Seq(
      "Title",
      "Title -> Section A",
      "Title -> Section A -> Sub A1",
      "Title -> Section B"))
    assert(chunks.forall(_.docName == "Title"))
    assert(chunks.map(_.text) == Seq("intro body", "a body", "a1 body", "b body"))
    assert(chunks.map(_.chunkIdx) == Seq(0, 1, 2, 3))
  }

  test("sibling header at same level replaces, not nests") {
    val md = "## A\na\n## B\nb"
    val chunks = MarkdownIngest.chunkMarkdown("/x.md", md)
    assert(chunks.map(_.enhancedTitle) == Seq("A", "B"))
  }

  test("preamble before any header keeps filename-stem metadata") {
    val md = "no headers at all\njust text"
    val chunks = MarkdownIngest.chunkMarkdown("/docs/readme.md", md)
    assert(chunks.size == 1)
    assert(chunks.head.chunkTitle == "readme")
    assert(chunks.head.enhancedTitle == "readme")
    assert(chunks.head.docName == "readme")
    assert(chunks.head.level == 0)
  }

  test("docName falls back to last subtitle when no H1") {
    val md = "## Only H2\nbody"
    val chunks = MarkdownIngest.chunkMarkdown("/x.md", md)
    assert(chunks.head.docName == "Only H2")
  }

  test("empty file yields no chunks; header-only file yields empty chunk") {
    assert(MarkdownIngest.chunkMarkdown("/e.md", "").isEmpty)
    assert(MarkdownIngest.chunkMarkdown("/e.md", "   \n  ").isEmpty)
    val headerOnly = MarkdownIngest.chunkMarkdown("/e.md", "# Lone Header")
    assert(headerOnly.size == 1 && headerOnly.head.text == "")
  }

  test("oversize chunks split by ceil-division and preserve content") {
    val body = ("x" * 100 + " ") * 90 // 9090 chars
    val md = s"# T\n$body"
    val max = 4096
    val chunks = MarkdownIngest.chunkMarkdown("/x.md", md, max)
    val expected = (body.trim.length + max - 1) / max
    assert(chunks.size == expected)
    assert(chunks.map(_.text).mkString == body.trim)
    assert(chunks.forall(_.chunkTitle == "T"))
    assert(chunks.map(_.chunkIdx) == chunks.indices)
  }

  test("chunker is total: random content never throws") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = rnd.nextString(rnd.nextInt(500))
      MarkdownIngest.chunkMarkdown("/r.md", s) // must not throw
    }
  }

  // ---- setext normalization (S5) --------------------------------------

  test("setext headings normalize to ATX") {
    import spark.implicits._
    val in = Seq(
      "Legacy Title\n============\n\nbody\n\nSub\n---\n\nmore").toDF("content")
    val out = in.select(MarkdownIngest.normalizeSetext($"content")).head.getString(0)
    assert(out == "# Legacy Title\n\nbody\n\n## Sub\n\nmore")
  }

  test("setext normalization ignores hr-like lines without a title above") {
    import spark.implicits._
    val in = Seq("para one\n\n---\n\npara two").toDF("content")
    val out = in.select(MarkdownIngest.normalizeSetext($"content")).head.getString(0)
    assert(out == "para one\n\n---\n\npara two")
  }

  // ---- scan (S1) + predicates (F1/F2/F7) ------------------------------

  test("scan keeps only md/mdx recursively and applies skip patterns") {
    val files = MarkdownIngest.scan(spark, corpusDir, skipPatterns = Seq("oracle"))
    val paths = files.select("path").collect().map(_.getString(0)).sorted
    assert(paths.length == 3) // intro.md, guides/vector.mdx, guides/setext.md
    assert(paths.forall(p => p.endsWith(".md") || p.endsWith(".mdx")))
    assert(!paths.exists(_.contains("oracle")))
    assert(!paths.exists(_.contains("notes.txt")))
  }

  test("scan limit caps the number of files (F7)") {
    val files = MarkdownIngest.scan(spark, corpusDir, limit = 2)
    assert(files.count() == 2)
  }

  // ---- end-to-end ingest ----------------------------------------------

  test("ingest chunks the fixture corpus with setext files normalized") {
    val chunks = MarkdownIngest.ingest(spark, corpusDir, Seq("oracle")).collect()
    val byPath = chunks.groupBy(c => c.path.split('/').last)
    assert(byPath("intro.md").map(_.chunkTitle).toSet ==
      Set("OceanBase Overview", "Architecture", "Storage", "Deployment"))
    // setext.md got normalized, so its setext headings chunk like ATX
    val setext = byPath("setext.md").sortBy(_.chunkIdx)
    assert(setext.map(_.enhancedTitle).toSeq ==
      Seq("Legacy Title", "Legacy Title -> Subsection"))
    assert(byPath("vector.mdx").head.docName == "Vector Search")
  }
}
