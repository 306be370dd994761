package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Weighted-average UDAF re-expressing the reference's Table-API
  * aggregate function
  * (UserDefinedFunctions/src/main/java/TableAPI/MyAggregateFunctionsForWeightedAvg.java):
  * accumulate(sum += value*weight; count += weight), merge by field
  * addition, getValue = sum/count (integer division), null on empty —
  * as a typed [[Aggregator]] so Catalyst plans it with partial
  * (map-side) aggregation + merge, the distributed shape the
  * reference expressed through merge().
  */
case class WAvgBuf(var sum: Long, var count: Long)

object WeightedAvg extends Aggregator[(Long, Long), WAvgBuf, java.lang.Long] {
  override def zero: WAvgBuf = WAvgBuf(0L, 0L)
  override def reduce(b: WAvgBuf, in: (Long, Long)): WAvgBuf = {
    b.sum += in._1 * in._2
    b.count += in._2
    b
  }
  override def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf = {
    a.sum += b.sum
    a.count += b.count
    a
  }
  override def finish(b: WAvgBuf): java.lang.Long =
    if (b.count == 0L) null else java.lang.Long.valueOf(b.sum / b.count)
  override def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
  override def outputEncoder: Encoder[java.lang.Long] = Encoders.LONG
}
