package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.11): dtype-preserving mean — the sum/count
  * pair reduces map-side and the finish truncates toward zero, exactly
  * the windowed-mean semantics of the pyramid reducer
  * (reference xarray_multiscale windowed_mean + preserve_dtype,
  * compress/png_to_zarr.py:386-392) lifted to a reusable aggregate:
  * `df.agg(udaf(FloorMean)($"x"))` or SQL `floor_mean(x)` after
  * `functions.udaf` registration.
  */
object FloorMean extends Aggregator[Long, (Long, Long), Long] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: Long): (Long, Long) = (b._1 + a, b._2 + 1)
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Long, Long)): Long =
    if (r._2 == 0) 0L else r._1 / r._2 // truncation ≡ preserve_dtype
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** Register as `floor_mean` for SQL use. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("floor_mean", org.apache.spark.sql.functions.udaf(this))
}
