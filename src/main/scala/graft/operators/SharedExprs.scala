package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Cross-engine parity expressions shared by the operator modules. Each
  * Spark expression has a DuckDB twin whose value is bit-identical on the
  * fixture; a change to one side (money-pinning scale, tokenizer rule)
  * must land in BOTH twins, which is why they live in one place.
  */
object SharedExprs {
  /** Integer-micros line revenue: exact under any aggregation order. */
  def revMicros: Column =
    expr("CAST(round(l_extendedprice * (1 - l_discount) * 1e6) AS BIGINT)")

  /** Whitespace tokenizer (Spark side): codegen'd split + empty-drop. */
  val toks = "array_remove(split(text, ' ', -1), '')"

  /** The DuckDB twin of [[toks]]: value-identical list filter. */
  val dToks = "list_filter(string_split(text, ' '), t -> t <> '')"

  /** In-row run-length counting (optimization r17, guide §2.4): over a
    * SORTED array column, [[runLengthBounds]] yields the 1-based start
    * index of every distinct-value run and [[runLengthCounts]] turns those
    * boundaries into (elem, cnt BIGINT) structs — together they compute
    * exactly what explode + groupBy(row_keys, elem).count computes, but as
    * intra-row codegen'd HOF work with NO corpus-sized exchange. Used by
    * the bm25 postings build and the per-doc term/bigram/bucket counters.
    */
  def runLengthBounds(srtCol: String): String =
    s"filter(sequence(1, size($srtCol)), " +
      s"i -> i = 1 OR element_at($srtCol, i) <> element_at($srtCol, i - 1))"

  def runLengthCounts(srtCol: String, bsCol: String,
      elemName: String, cntName: String): String =
    s"transform($bsCol, (b, j) -> struct(element_at($srtCol, b) AS $elemName, " +
      s"CAST(IF(j + 2 > size($bsCol), size($srtCol) + 1, " +
      s"element_at($bsCol, j + 2)) - b AS BIGINT) AS $cntName))"
}
