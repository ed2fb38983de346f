package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding storage quantization (added scope, 100 TB posture): at
  * cluster scale the embedding column dominates storage and shuffle bytes
  * (64-dim float32 = 256 B/row). Symmetric per-vector int8 quantization
  * cuts that 4× with bounded relative error (max-abs scaling), and the
  * approximate kNN layers tolerate the noise — the standard
  * store-quantized / search-requantized pattern of IVF systems.
  *
  * Pure array higher-order functions — whole-stage codegen, no UDF.
  */
object VectorQuant {

  /** `array<float>` → struct(scale float, q array<tinyint>), where
    * x ≈ q * scale and scale = max|x| / 127 (1.0 for all-zero vectors so
    * dequantization is total).
    */
  def quantizeVec(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, x => abs(x)))
    val scale = when(maxAbs > 0, maxAbs / lit(127.0f)).otherwise(lit(1.0f))
    struct(
      scale.cast("float").as("scale"),
      transform(vec, x => round(x / scale).cast("tinyint")).as("q"))
  }

  /** Inverse of [[quantizeVec]]: struct(scale, q) → `array<float>`. */
  def dequantizeVec(qv: Column): Column =
    transform(qv.getField("q"),
      x => (x.cast("float") * qv.getField("scale")).cast("float"))
}
