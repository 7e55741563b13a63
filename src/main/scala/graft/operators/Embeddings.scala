package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding storage/serving utilities for the training-data pipeline:
  * int8 scale-offset quantization (the standard 4× storage cut before
  * ANN serving) and deterministic dataset splitting.
  *
  * Everything is map-side expressions — zero shuffle, whole-stage
  * codegen — and pure IEEE arithmetic with explicit fold order, so the
  * DuckDB oracle reproduces each value bit-for-bit.
  */
object Embeddings {

  /** Per-vector affine int8 quantization: code_i = round((x_i - min) /
    * scale) with scale = (max - min)/255, plus reconstruction stats.
    * A constant vector (scale 0) codes to all zeros. */
  def quantizeInt8(emb: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val e = col(embCol)
    val mn = array_min(e)
    val mx = array_max(e)
    val scale = (mx - mn) / 255.0
    val codes = transform(e, x =>
      when(scale === 0.0, lit(0.0)).otherwise(round((x - mn) / scale))
        .cast("long"))
    val dequant = transform(codes, c => mn + c.cast("double") * scale)
    // strict left fold (mirrored by list_reduce) for the error sum
    val sqErr = aggregate(
      zip_with(dequant, e, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)
    emb.select(
      col(idCol),
      size(e).cast("long").as("n_dims"),
      round(mn, 6).as("q_min"),
      round(scale, 6).as("q_scale"),
      aggregate(codes, lit(0L), (acc, c) => acc + c).as("sum_codes"),
      round(sqErr / size(e), 6).as("recon_mse"))
  }

  /** Matryoshka-style truncation: keep the first `dims` coordinates and
    * L2-renormalize — the standard dimensionality cut when embeddings
    * were trained with nested (MRL) objectives. Map-side only; the norm
    * is a strict left fold of squares (mirrored by list_reduce over a
    * 0.0-prepended squares list) and sqrt is correctly rounded in IEEE,
    * so every renormalized coordinate is bit-identical across engines.
    * Output is the flat (vec_id, dim, value) shape (like
    * [[KMeansOp.updatePerDim]]); a zero-norm prefix renormalizes to
    * zeros rather than NaN. */
  def truncateRenorm(emb: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding", dims: Int = 16): DataFrame = {
    val p = transform(slice(col(embCol), 1, dims), x => x.cast("double"))
    val nrm = sqrt(aggregate(transform(p, x => x * x),
      lit(0.0), (acc, v) => acc + v))
    emb.select(col(idCol), p.as("p"), nrm.as("nrm"))
      .select(col(idCol), col("nrm"), posexplode(col("p")).as(Seq("i", "x")))
      .select(col(idCol), col("i").cast("long").as("i"),
        round(when(col("nrm") === 0.0, 0.0).otherwise(col("x") / col("nrm")), 6)
          .as("x_norm"),
        round(col("nrm"), 6).as("norm_k"))
  }

  /** Deterministic hash split: Knuth multiplicative hash of the id mod
    * 1000 buckets → train/val/test. Stable under replays, reshuffles, and
    * engine changes — the property a split must have so no example ever
    * migrates between train and eval. */
  def assignSplit(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val h = pmod(id.cast("long") * 2654435761L, lit(1000L))
    when(h < trainPct * 10, "train")
      .when(h < (trainPct + valPct) * 10, "val")
      .otherwise("test")
  }
}
