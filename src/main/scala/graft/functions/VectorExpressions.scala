package graft.functions

import org.apache.spark.sql.Column

/** Column-level facade over the native codegen'd vector expressions
  * (`org.apache.spark.sql.graft.DotProductQ` — see that file for the
  * semantics/overflow contract). */
object VectorFunctions {

  /** Exact BIGINT dot product of two quantized vectors (fused codegen loop). */
  def dotQ(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.VectorBridge.dotQ(a, b)
}
