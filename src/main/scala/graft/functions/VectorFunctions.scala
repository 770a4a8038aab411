package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Column-level dense-vector math over `array<float>` embedding columns
  * (builder brief: similarity search). Uses `zip_with` / `aggregate`
  * higher-order functions — evaluated inside Tungsten with no object
  * boxing per element beyond the array itself, and no UDF serialization.
  */
object VectorFunctions {

  /** Cast an array<float> to array<double> for stable arithmetic. */
  def toDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Dot product of two equal-length numeric arrays — codegen'd native
    * [[VecDot]] expression (same left-to-right summation order as the
    * HOF formulation it replaced, so values are bit-identical).
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftExprBridge
    GraftExprBridge.column(
      VecDot(GraftExprBridge.expression(a), GraftExprBridge.expression(b)))
  }

  /** Euclidean norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in [-1, 1]; 0 when either vector is all-zero. */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a)
    val bd = toDouble(b)
    val denom = l2Norm(ad) * l2Norm(bd)
    when(denom === 0.0, lit(0.0)).otherwise(dot(ad, bd) / denom)
  }

}
