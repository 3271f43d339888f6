package graft.sources

import java.io.{BufferedInputStream, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}
import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
import org.apache.commons.compress.archivers.zip.ZipArchiveInputStream
import org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream
import org.apache.commons.compress.compressors.gzip.GzipCompressorInputStream
import org.apache.commons.compress.compressors.xz.XZCompressorInputStream

/** S6: archive-extraction source — the driver-side pre-step before the
  * markdown scan (/root/reference/src/common/compress.py:28-79, extension
  * list :23-25). Extraction is inherently a local-FS operation (the
  * reference does it before ingest too); the Spark job starts at
  * [[MarkdownIngest.scan]] over the extracted directory.
  *
  * Safety: entry paths are resolved against the destination and rejected
  * if they escape it (zip-slip), which the reference does not guard.
  */
object Archive {

  /** supported extensions (compress.py:23-25) */
  val ArchiveExts: Seq[String] = Seq(
    ".zip", ".tar.gz", ".tgz", ".tar.bz2", ".tar.xz", ".tar",
    ".gz", ".bz2", ".xz")

  def isArchiveFile(path: String): Boolean = {
    val p = path.toLowerCase
    ArchiveExts.exists(p.endsWith)
  }

  /** Extract `archivePath` into `destDir`; returns true on success
    * (the reference's boolean contract, compress.py:28). */
  def extract(archivePath: String, destDir: String): Boolean = {
    val p = archivePath.toLowerCase
    try {
      Files.createDirectories(Paths.get(destDir))
      val raw = new BufferedInputStream(new FileInputStream(archivePath))
      if (p.endsWith(".zip")) {
        extractEntries(new ZipArchiveInputStream(raw), destDir)
      } else if (p.endsWith(".tar.gz") || p.endsWith(".tgz")) {
        extractEntries(new TarArchiveInputStream(
          new GzipCompressorInputStream(raw)), destDir)
      } else if (p.endsWith(".tar.bz2")) {
        extractEntries(new TarArchiveInputStream(
          new BZip2CompressorInputStream(raw)), destDir)
      } else if (p.endsWith(".tar.xz")) {
        extractEntries(new TarArchiveInputStream(
          new XZCompressorInputStream(raw)), destDir)
      } else if (p.endsWith(".tar")) {
        extractEntries(new TarArchiveInputStream(raw), destDir)
      } else if (p.endsWith(".gz") || p.endsWith(".bz2") || p.endsWith(".xz")) {
        // single-file compression: decompress to the stem name
        val stem = Paths.get(archivePath).getFileName.toString
          .replaceAll("\\.(gz|bz2|xz)$", "")
        val in =
          if (p.endsWith(".gz")) new GzipCompressorInputStream(raw)
          else if (p.endsWith(".bz2")) new BZip2CompressorInputStream(raw)
          else new XZCompressorInputStream(raw)
        val out = new FileOutputStream(s"$destDir/$stem")
        try in.transferTo(out)
        finally {
          out.close()
          in.close()
        }
        true
      } else {
        raw.close(); false
      }
    } catch {
      case _: Exception => false
    }
  }

  private def extractEntries(
      in: org.apache.commons.compress.archivers.ArchiveInputStream[
        _ <: org.apache.commons.compress.archivers.ArchiveEntry],
      destDir: String): Boolean = {
    val destRoot = Paths.get(destDir).toAbsolutePath.normalize
    try {
      Iterator.continually(
        in.getNextEntry: org.apache.commons.compress.archivers.ArchiveEntry)
        .takeWhile(_ != null)
        .foreach { e =>
          val target = safeResolve(destRoot, e.getName)
          if (e.isDirectory) Files.createDirectories(target)
          else {
            Files.createDirectories(target.getParent)
            val out = new FileOutputStream(target.toFile)
            try in.transferTo(out)
            finally out.close()
          }
        }
      true
    } finally in.close()
  }

  private def safeResolve(root: Path, name: String): Path = {
    val target = root.resolve(name).normalize
    require(target.startsWith(root), s"archive entry escapes dest: $name")
    target
  }
}
