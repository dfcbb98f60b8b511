package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}

/** The ONE sanctioned constructor for a partitionless (single-partition)
  * window — every such window in this library runs over a frame whose row
  * count is bounded BY CONSTRUCTION, never by the corpus (r13 verdict
  * item 7: centralize the claim so the `WindowExec: No Partition Defined`
  * warning class can be silenced in the driver mains' logs without hiding
  * a real unbounded-window regression behind 100 benign lines).
  *
  * The bounded classes in use, by tag at the call sites:
  *  - `calendar`: rows are distinct days/periods of a fixed range (q53
  *    growth days, q108/q111 moving-correlation day spines, q100 digit
  *    table, q74/q98/q99 band tables — tens of rows).
  *  - `pool`: rows are a k-bounded candidate pool (RRF rank fusion over
  *    two top-k lists, the PQ re-rank curve's ≤ max-pool ADC ranking).
  *  - `vocab`: rows are a capped vocabulary/symbol table (text_vocab's
  *    top-N cut, BPE symbol ids bounded by distinct merge symbols).
  *
  * A window that can't name its bound with one of these tags (or a new
  * documented one) must be partitioned — use a keyed window or the
  * [[BandedWindow]] machinery instead. The tag is required so every call
  * site self-documents; it is not used at runtime.
  */
object BoundedWindow {

  val tags: Set[String] = Set("calendar", "pool", "vocab")

  def ordered(boundTag: String, cols: Column*): WindowSpec = {
    require(tags(boundTag),
      s"unknown bounded-window class '$boundTag' — a partitionless window " +
        s"must name its row-count bound (one of $tags) or be partitioned")
    Window.orderBy(cols: _*)
  }
}
