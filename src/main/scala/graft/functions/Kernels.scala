package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Java-reachable forwarders for native-kernel static calls emitted by
  * doGenCode. The kernels live in `graft.functions.native`, but `native`
  * is a JAVA RESERVED WORD — generated code referencing that package
  * fails Janino compilation ("Unexpected selector 'native'") and the
  * whole stage silently drops to interpreted mode. Codegen references
  * THIS object instead (a keyword-free path); Scala call sites keep
  * using the `native` package directly.
  */
object Kernels {
  def hausdorff(a: ArrayData, b: ArrayData): Double =
    graft.functions.native.HausdorffDistance.compute(a, b)
}
