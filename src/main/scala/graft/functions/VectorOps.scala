package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns — pure higher-order
  * built-ins (SURVEY.md §2 B.5), fully codegen'd by Catalyst: no UDF, no
  * serialization boundary, safe inside WholeStageCodegen at 100 TB.
  *
  * All kernels fold left-to-right in DOUBLE (cast arrays first via
  * [[toDouble]]) so results are bit-reproducible and engine-comparable.
  */
object VectorOps {
  def toDouble(a: Column): Column = a.cast("array<double>")

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)

  def norm2(a: Column): Column = dot(a, a)

  def l2norm(a: Column): Column = sqrt(norm2(a))

  /** Cosine similarity; 0-norm guarded to null. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2norm(a) * l2norm(b)
    when(denom === 0.0, lit(null).cast("double")).otherwise(dot(a, b) / denom)
  }
}
