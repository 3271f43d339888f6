package graft.sources

import scala.sys.process._

/** S7: GitHub/git repository source — shallow clone into a destination
  * dir, then treat as [[MarkdownIngest.scan]] input
  * (/root/reference/src/common/download.py:16-40: `git clone --depth 1`,
  * 300 s timeout). Driver-side pre-step like the reference. */
object GitSource {

  val TimeoutSeconds = 300

  /** Clone `url` (any git URL, including `file://` for tests) shallowly
    * into `destDir`; returns true on success (download.py's boolean
    * contract). */
  def cloneRepo(url: String, destDir: String,
      timeoutSeconds: Int = TimeoutSeconds): Boolean =
    try {
      val cmd = Seq("timeout", timeoutSeconds.toString,
        "git", "clone", "--depth", "1", url, destDir)
      cmd.!(ProcessLogger(_ => (), _ => ())) == 0
    } catch {
      case _: Exception => false
    }
}
