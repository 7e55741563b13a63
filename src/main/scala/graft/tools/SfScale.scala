package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev scratch (round-12, verdict item 3): synthesize a larger SF under
  * /tmp by replicating every sf0.1 table `mult`× with disjoint key
  * ranges — the round-9 sf0.3 recipe, rebuilt as a committed tool so
  * the scaling measurement is reproducible. Never touches the
  * read-only testdata.
  *
  * Referential integrity: every BIGINT key AND its foreign references
  * offset by the same replica stride (orders.o_custkey moves with
  * customer.c_custkey, lineitem's three keys with their parents), so
  * join selectivities scale with the data instead of breaking.
  * Dimension tables (nation, region) stay 1× — their keys are
  * unoffset, as at any TPC-H scale. Replica texts carry a distinct
  * leading token (shingle/term sets stay distinct — near-dups, not an
  * exact-copy explosion; n_chars recomputed) and embeddings get a
  * deterministic per-replica sign-flip pattern (cells stay populated,
  * no duplicate vectors). Offsets are multiples of 10^7, preserving
  * the suite's `% k` fixture patterns for every k that divides 10^7's
  * residue classes evenly enough (the same stride ScalePoint uses).
  *
  * Usage: tools/run.sh graft.tools.SfScale [mult] [outDir]
  * (defaults: 3, /tmp/graft_sf0.3) */
object SfScale {
  def main(args: Array[String]): Unit = {
    val mult = if (args.nonEmpty) args(0).toInt else 3
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf0.3"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.warehouse.dir", s"/tmp/graft_warehouse_${graft.Fs.pid}")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val K = 10000000L

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$sfDir/$name.parquet")

    /** Write `mult` replicas of `name`, transforming replica i > 0 with
      * `f(df, i)`; replica 0 passes through verbatim. Single output file
      * per table, mirroring the testdata layout (one file, one row
      * group) so the degenerate-input behavior under test is identical. */
    def write(name: String)(f: (DataFrame, Int) => DataFrame): Unit = {
      val base = tbl(name)
      val dst = s"$out/$name.parquet"
      if (new java.io.File(s"$dst/_SUCCESS").exists()) return
      (0 until mult).map(i => if (i == 0) base else f(base, i))
        .reduce(_ unionByName _)
        .coalesce(1).write.mode("overwrite").parquet(dst)
      println(s"[sfscale] $name x$mult -> $dst")
    }
    def off(c: String, i: Int) = col(c) + lit(i * K)

    write("nation")((df, _) => df.limit(0))   // dims stay 1x
    write("region")((df, _) => df.limit(0))
    write("customer")((df, i) => df
      .withColumn("c_custkey", off("c_custkey", i)))
    write("supplier")((df, i) => df
      .withColumn("s_suppkey", off("s_suppkey", i)))
    write("part")((df, i) => df
      .withColumn("p_partkey", off("p_partkey", i)))
    write("orders")((df, i) => df
      .withColumn("o_orderkey", off("o_orderkey", i))
      .withColumn("o_custkey", off("o_custkey", i)))
    write("lineitem")((df, i) => df
      .withColumn("l_orderkey", off("l_orderkey", i))
      .withColumn("l_partkey", off("l_partkey", i))
      .withColumn("l_suppkey", off("l_suppkey", i)))
    write("events")((df, i) => df
      .withColumn("event_id", off("event_id", i))
      .withColumn("user_id", off("user_id", i)))
    write("documents")((df, i) => df
      .withColumn("doc_id", off("doc_id", i))
      .withColumn("text", concat(lit(s"rep$i "), col("text")))
      .withColumn("n_chars", length(col("text")).cast("long")))
    write("embeddings")((df, i) => df
      .withColumn("vec_id", off("vec_id", i))
      .withColumn("embedding",
        transform(col("embedding"), (x, j) =>
          when((j + lit(i)) % 3 === 0, -x).otherwise(x))))
    spark.stop()
  }
}
