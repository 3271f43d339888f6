package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Chat-history / component-routing column functions — SURVEY.md §2.2
  * F4/F5/F6, the deterministic data path around the reference's LLM
  * nodes.
  */
object ChatFunctions {

  /** F4: user-turn extraction — keep `role == "user"`, newline-join
    * contents in order (/root/reference/src/rag/rag.py:48-58). Aggregate
    * expression over (role, content, seq) rows: the seq rides inside the
    * collected struct so the join order survives parallel merge. */
  def userHistoryText(role: Column, content: Column, seq: Column): Column =
    array_join(
      transform(
        array_sort(collect_list(when(role === "user",
          struct(seq.as("s"), content.as("c"))))),
        x => x.getField("c")),
      "\n")

  /** F6: keep the last `n` messages (chat_ui.py:317-326, `[-history_len:]`
    * semantics — fewer than n messages means keep all). */
  def truncateHistory(messages: Column, n: Int): Column =
    when(size(messages) <= n, messages).otherwise(slice(messages, -n, n))

  /** F6: cut a message at the reference-tips marker — everything before
    * the first occurrence (chat_ui.py:346-352). */
  def stripAtMarker(content: Column, marker: String): Column =
    substring_index(content, marker, 1)

  /** F5: component validation — order-preserving first-occurrence dedup,
    * keep only supported names, force-append the default when absent
    * (rag_graph.py:343-354; the reference's visited-set loop + default
    * append). */
  def validateComponents(
      requested: Column,
      supported: Seq[String],
      default: String): Column = {
    val sup = array(supported.map(lit): _*)
    val kept = filter(array_distinct(requested),
      x => array_contains(sup, x))
    when(array_contains(kept, default), kept)
      .otherwise(concat(kept, array(lit(default))))
  }
}
