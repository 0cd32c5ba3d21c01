package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Embedding quantization — the storage-side operator of a vector corpus at
 * scale: 100 TB of float32 embeddings quantized symmetrically to int8 is
 * 4× less to scan, shuffle, and cache for every downstream ANN / dedup
 * pass, at a bounded reconstruction error the pipeline can verify.
 *
 * Symmetric per-vector int8: `scale = max|xᵢ| / 127`, `qᵢ =
 * round(xᵢ / scale)` ∈ [-127, 127]. Every step is an exact IEEE-754
 * operation (float→double widening is exact, one correctly-rounded
 * division per element, HALF_UP rounding — the same rule DuckDB's
 * `round` applies), so quantized vectors, scales, and reconstruction
 * errors are bit-identical in any engine — the q47 oracle recomputes all
 * three from the raw embeddings. The all-zero vector quantizes to zeros
 * with `scale = 0` (guarded — its division would be NaN).
 *
 * Everything is per-row narrow work; nothing shuffles. The reference has
 * no vector surface at all — this extends the SURVEY.md §2.11 similarity
 * stack ([[Similarity]], [[AnnLsh]], [[AnnIvf]]) with its storage format.
 */
object Quantize {

  /**
   * `(idCol, scale, q, max_err)`: the per-vector scale, the int8 codes
   * (as ints — parquet/oracle-friendly), and the exact reconstruction
   * error `max|qᵢ·scale − xᵢ|`, which the symmetric scheme bounds by
   * `scale / 2` (spec-asserted).
   */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxabs = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    df.select(col(idCol), col(vecCol).as("vec"), maxabs.as("maxabs"))
      .withColumn("scale", col("maxabs") / lit(127.0d))
      .withColumn("q",
        when(col("maxabs") === 0d, transform(col("vec"), _ => lit(0)))
          .otherwise(transform(col("vec"),
            x => round(x.cast("double") / col("scale")).cast("int"))))
      .withColumn("max_err",
        when(col("maxabs") === 0d, lit(0.0d))
          .otherwise(array_max(zip_with(col("q"), col("vec"),
            (qi, xi) => abs(qi.cast("double") * col("scale") - xi.cast("double"))))))
      .select(col(idCol), col("scale"), col("q"), col("max_err"))
  }
}
