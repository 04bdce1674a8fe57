package graft.core

/** One compressed segment: metadata + model parameters, matching the
  * reference's segment schema
  * (/root/reference/crates/modelardb_types/src/schemas.rs:40-52).
  */
final case class Segment(
    modelTypeId: Byte,
    startTime: Long,
    endTime: Long,
    timestamps: Array[Byte],
    minValue: Float,
    maxValue: Float,
    values: Array[Byte],
    residuals: Array[Byte],
    error: Float) {

  /** Number of data points the segment represents. */
  def length: Int = Models.len(startTime, endTime, timestamps)

  /** Sum of the segment's values computed from the model without gridding. */
  def sum: Float = Models.sum(
    modelTypeId, startTime, endTime, timestamps, minValue, maxValue, values, residuals)

  /** Reconstruct the segment's (timestamp, value) pairs. */
  def gridded: (Array[Long], Array[Float]) = {
    val ts = new LongBuf(64)
    val vs = new FloatBuf(64)
    Models.grid(modelTypeId, startTime, endTime, timestamps, minValue, maxValue,
      values, residuals, ts, vs)
    (ts.toArray, vs.toArray)
  }
}
