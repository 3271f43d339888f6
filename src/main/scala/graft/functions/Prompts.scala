package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** X9: prompt templating — named-placeholder substitution, the
  * deterministic piece of the reference's agent prompts
  * (/root/reference/src/agents/base.py:118-124: `str.format` with
  * `{today}`, `{document_snippets}`, `{supported_components}`, ...).
  * Column-valued so a million prompts render as one codegen'd projection.
  */
object Prompts {

  /** Fill `{name}` placeholders from (name -> column) bindings.
    * Placeholders without a binding are left intact; literal `{` not
    * forming a known placeholder is untouched (simpler than Python
    * format's `{{` escaping, documented divergence). A null binding
    * renders as the empty string — `replace` with a null replacement
    * would otherwise null out the whole prompt. */
  def render(template: String, bindings: Seq[(String, Column)]): Column =
    bindings.foldLeft(lit(template): Column) { case (acc, (name, value)) =>
      replace(acc, lit(s"{$name}"),
        coalesce(value.cast("string"), lit("")))
    }
}
