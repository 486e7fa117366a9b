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
}
