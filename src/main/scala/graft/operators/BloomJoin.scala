package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.BloomMightContain

/** Bloom-pruned join: shrink the probe side BEFORE its shuffle using a
  * Bloom filter of the build side's key set
  * (see [[graft.expressions.BloomMightContain]] for the probe kernel).
  *
  * The pattern targets the join shape broadcast can't save: the dim is
  * too big to broadcast as ROWS, but its key SET fits a few megabytes
  * of bloom bits. Building the filter is one aggregate over the dim;
  * probing is a map-side filter on the fact — so the fact rows that
  * cannot match never enter the shuffle. False positives survive the
  * prune and are removed by the real join that follows; false
  * negatives cannot happen, so the join's result is exactly the
  * unpruned join's. At 100 TB with a 1% -selective dim filter this cuts
  * the shuffled fact bytes ~100×, the same lever as Spark's injected
  * runtime bloom filter but available as an explicit operator (e.g. to
  * reuse one filter across several queries).
  */
object BloomJoin {

  /** Bloom filter of `dim`'s `dimKey` column, serialized. One aggregate
    * job; the result is a driver-side byte array sized by fpp. */
  def keyFilter(dim: DataFrame, dimKey: String,
      expectedKeys: Long, fpp: Double = 0.01): Array[Byte] = {
    val bf = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Register `bloom_might_contain` (idempotent) and build the probe
    * column for `key` against the serialized filter. */
  def mightContain(spark: org.apache.spark.sql.SparkSession)(
      key: Column, filterBytes: Array[Byte]): Column = {
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("bloom_might_contain")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "bloom_might_contain",
        exprs => BloomMightContain(exprs(0), exprs(1)), "built-in")
    call_function("bloom_might_contain", key, lit(filterBytes))
  }

  /** `fact` reduced to rows whose `factKey` might match `dim`'s
    * `dimKey` set — a map-side superset prune to place below a join. */
  def pruneFact(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String, expectedKeys: Long): DataFrame =
    fact.where(mightContain(fact.sparkSession)(
      col(factKey), keyFilter(dim, dimKey, expectedKeys)))
}
