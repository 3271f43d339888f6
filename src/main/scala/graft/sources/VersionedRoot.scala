package graft.sources

import org.apache.spark.sql.SparkSession

/** Versioned index-root layout with an atomically-swapped current
  * pointer — the publish/rollback story for every rebuild-shaped
  * lifecycle ([[graft.operators.IvfIndex.compact]],
  * [[graft.operators.IvfIndex.rebalance]] onto a copy,
  * [[graft.operators.Pq.refitRoot]]): maintenance writes a FRESH
  * version directory under the base (`base/v-N`), and readers follow
  * one tiny pointer file (`base/_current`, contents `v-N`) that the
  * publisher swaps by ATOMIC RENAME — the same primitive Spark's own
  * checkpoint FileContext manager commits with, so a reader sees the
  * old version or the new one, never a torn root. The serving face
  * ([[graft.streaming.EventStreams.servingSearch]]) resolves the
  * pointer once per micro-batch, so a swap lands at the very next
  * trigger with no coordination channel to the serving JVM (the
  * publisher is a different process in production) — replacing the
  * directory-rename swap, whose retire-then-move window left a
  * trigger with NO root at all.
  *
  * The reference rebuilds its index table in place under a lock
  * (load.py:26's CREATE-once DDL); a lake layout gets the same
  * "readers never see a half-built index" guarantee from immutable
  * version dirs + the pointer swap, and keeps the previous version on
  * disk for instant rollback ([[publish]] again with the old number)
  * until [[prune]] reclaims it.
  *
  * Scale notes: the pointer is one ~4-byte file read per trigger (no
  * listing, no corpus I/O); version dirs are plain index roots, so
  * every existing operator works on `base/v-N` unchanged; unpointered
  * paths resolve to themselves, keeping the layout fully opt-in. */
object VersionedRoot {

  private[graft] val PointerFile = "_current"
  private val VersionPrefix = "v-"

  /** the version directory path for `n` (not created here) */
  def versionDir(base: String, n: Int): String = s"$base/$VersionPrefix$n"

  /** smallest unused version number under `base` (1 for a fresh base) —
    * counts every `v-N` directory present, PUBLISHED OR NOT, so an
    * abandoned build never collides with the next one */
  def nextVersion(spark: SparkSession, base: String): Int = {
    val root = new org.apache.hadoop.fs.Path(base)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) 1
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap(_.getPath.getName.stripPrefix(VersionPrefix).toIntOption)
      .maxOption.fold(1)(_ + 1)
  }

  /** Publish `v-N` as the current version: the pointer is written to a
    * temp file and RENAMED over `_current` with FileContext's
    * Rename.OVERWRITE — atomic on posix and HDFS, so a concurrent
    * reader sees exactly one complete pointer value. Fails loudly if
    * the version directory does not exist (publishing a root that was
    * never written would blackhole every search). Re-publishing an
    * OLDER version is the rollback path and is deliberately legal. */
  def publish(spark: SparkSession, base: String, n: Int): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new org.apache.hadoop.fs.Path(versionDir(base, n))
    val fs = dir.getFileSystem(conf)
    require(fs.exists(dir), s"publish: $dir does not exist — write the " +
      "version root first, publish second")
    val pointer = new org.apache.hadoop.fs.Path(s"$base/$PointerFile")
    val tmp = new org.apache.hadoop.fs.Path(
      s"$base/.$PointerFile.${ProcessHandle.current().pid()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(s"$VersionPrefix$n".getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      pointer.toUri, conf)
    // a failed rename must not leak the tmp pointer: a later
    // nextVersion/prune walks the base listing, and an orphaned
    // `.`-file is harmless to readers but accretes forever
    try fc.rename(tmp, pointer,
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    catch {
      case e: Throwable =>
        try fs.delete(tmp, false)
        catch { case scala.util.control.NonFatal(_) => }
        throw e
    }
  }

  /** Build-then-publish in one idiom — the ONE publish path every
    * rebuild-shaped lifecycle shares ([[graft.operators.IvfIndex.compact]]
    * via `compactVersioned`, [[graft.operators.IvfIndex.rebalance]] via
    * `rebalanceVersioned`, [[graft.operators.Pq.refitRoot]] callers):
    * `build` writes a complete root into the fresh `v-N` directory this
    * helper hands it, and the pointer swap publishes it atomically only
    * AFTER the build returns — a build that throws leaves the pointer
    * untouched (readers keep the old version; the abandoned `v-N` is
    * invisible, never collides with the next build, and is reclaimed by
    * [[prune]] once a newer version publishes past it). Returns the
    * published version number. */
  def publishVia(spark: SparkSession, base: String)
      (build: String => Unit): Int = {
    val n = nextVersion(spark, base)
    build(versionDir(base, n))
    publish(spark, base, n)
    n
  }

  /** the currently-published version directory, if `base` carries a
    * pointer */
  def current(spark: SparkSession, base: String): Option[String] = {
    val pointer = new org.apache.hadoop.fs.Path(s"$base/$PointerFile")
    val fs = pointer.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(pointer)) None
    else {
      val in = fs.open(pointer)
      val v =
        try new String(in.readAllBytes(), "UTF-8").trim
        finally in.close()
      require(v.startsWith(VersionPrefix) &&
        v.stripPrefix(VersionPrefix).toIntOption.nonEmpty,
        s"corrupt version pointer $pointer: '$v'")
      Some(s"$base/$v")
    }
  }

  /** resolve a path a reader was handed: follow the pointer when one
    * exists, otherwise the path IS the root (plain unversioned
    * layouts stay first-class) */
  def resolve(spark: SparkSession, path: String): String =
    current(spark, path).getOrElse(path)

  /** delete PUBLISHED-AND-SUPERSEDED version directories — versions
    * strictly OLDER than the current pointer, beyond the `keep` most
    * recent of them (rollback headroom); returns the removed versions.
    * Never touches the pointer, the current dir, or any version NEWER
    * than the published one: a newer directory is an in-progress (or
    * abandoned) build awaiting publish, and deleting it would defeat
    * [[nextVersion]]'s no-collision guarantee — it becomes prunable
    * only once a later publish supersedes it. An unpointered base
    * prunes nothing for the same reason (every version there is a
    * build nothing has published yet). */
  def prune(spark: SparkSession, base: String, keep: Int = 1): Seq[Int] = {
    require(keep >= 0, s"keep must be >= 0, got $keep")
    val root = new org.apache.hadoop.fs.Path(base)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val curN = current(spark, base)
      .flatMap(p => new org.apache.hadoop.fs.Path(p).getName
        .stripPrefix(VersionPrefix).toIntOption)
    val versions = fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        st.getPath.getName.stripPrefix(VersionPrefix).toIntOption
          .filter(n => curN.exists(n < _))
          .map(n => (n, st.getPath))
      }
      .sortBy(-_._1)
    versions.drop(keep).map { case (n, p) => fs.delete(p, true); n }
  }
}
