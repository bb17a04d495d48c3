package graft.graph

import org.apache.spark.sql.types._

/** Shared support for the small-graph in-driver fast paths: a NATIVE
  * ordering per supported column type so min-label semantics match the
  * distributed loops exactly (a string ordering over numeric labels would
  * pick "100" over "99"). Types without a listed ordering fall back to
  * the distributed path. */
private[graph] object GraphDriverPath {
  def orderingFor(dt: DataType): Option[Ordering[Any]] = dt match {
    // Spark's StringType ordering is UTF8String's byte comparison (=
    // code-POINT order); java.lang.String compares UTF-16 code UNITS,
    // which diverges for supplementary-plane characters — wrap in
    // UTF8String so the driver path picks the same min label.
    case StringType => Some(Ordering.by((a: Any) =>
      org.apache.spark.unsafe.types.UTF8String.fromString(a.asInstanceOf[String])))
    case LongType | IntegerType | ShortType | ByteType =>
      Some(Ordering.by((a: Any) => a.asInstanceOf[Number].longValue()))
    case DoubleType | FloatType =>
      Some(Ordering.by((a: Any) => a.asInstanceOf[Number].doubleValue()))
    case _ => None
  }
}
