package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{ReplicaSink, SnapshotManifest}

/** Property pin for the change data feed: over RANDOM upsert histories,
  * the feed between ANY two retained versions, folded onto the earlier
  * version's rows, reproduces the later version exactly — insert /
  * delete / update classification, before/after images, and the
  * unchanged-row filter all participate, so any misclassification or
  * lost row falsifies the fold. Histories are built through the real
  * [[ReplicaSink.upsertBatch]] merge (wire schema, hash buckets,
  * manifest commits), not a synthetic layout.
  */
class CdfPropertySpec extends AnyFunSuite {
  import SparkTest._

  private val Schema = "uri STRING, key STRING, image ARRAY<STRING>"

  /** One micro-batch: per touched key, insert/update (live image) or
    * delete. Keys are drawn from a small pool so histories revisit
    * keys (that is where update/delete classification gets exercised). */
  private case class BOp(key: String, img: Seq[String], deleted: Boolean)

  private val batchGen: Gen[List[BOp]] = for {
    n <- Gen.choose(1, 6)
    ops <- Gen.listOfN(n, for {
      k <- Gen.oneOf((1 to 12).map(i => s"k$i"))
      v <- Gen.choose(0, 99)
      del <- Gen.frequency(3 -> false, 1 -> true)
    } yield BOp(k, Seq(k, v.toString), del))
  } yield ops.groupBy(_.key).map(_._2.last).toList // one op per key/batch

  private val historyGen: Gen[List[List[BOp]]] =
    Gen.choose(3, 6).flatMap(n => Gen.listOfN(n, batchGen))

  test("property: CDF(v_i, v_j) folded onto v_i reproduces v_j, random histories") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    (1 to 4).foreach { trial =>
      val history = historyGen(Gen.Parameters.default,
        Seed(0xCDF0L + trial)).get
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_cdf_prop$trial").toFile
      SnapshotManifest.setRetention(root, 32) // keep every version
      history.zipWithIndex.foreach { case (ops, i) =>
        val delta = ops.map(o => ("flv://m/g/t", o.key, o.img, o.deleted))
          .toDF("uri", "key", "image", "deleted")
        ReplicaSink.upsertBatch(root.toString)(delta, i.toLong)
      }
      val head = SnapshotManifest.read(root).version
      assert(head >= 2, s"trial $trial produced a degenerate history")
      // every adjacent-and-spanning pair within the retained window
      val pairs = Seq((1L, head), (head - 1, head), (1L, (1L + head) / 2))
        .filter { case (a, b) => a < b }.distinct
      pairs.foreach { case (vA, vB) =>
        val feed = ReplicaSink.changesBetween(spark, root.toString,
          vA, vB, Schema, Seq("uri", "key"))
        val base = ReplicaSink.readReplicaRowsAt(spark, root.toString, vA).get
        val rebuilt = base
          .join(feed.select(col("uri"), col("key")), Seq("uri", "key"),
            "left_anti")
          .unionByName(feed.where(col("change_type") =!= "delete")
            .select(col("uri"), col("key"),
              col("after_image").as("image")))
          .select(col("key"), array_join(col("image"), "|").as("img"))
          .collect().map(r => (r.getString(0), r.getString(1))).sorted
        val target = ReplicaSink.readReplicaRowsAt(spark, root.toString, vB)
          .get
          .select(col("key"), array_join(col("image"), "|").as("img"))
          .collect().map(r => (r.getString(0), r.getString(1))).sorted
        assert(rebuilt.toSeq == target.toSeq,
          s"trial $trial: CDF($vA→$vB) fold diverged from v$vB")
        // and the feed must be MINIMAL: no row for a key whose image is
        // unchanged between the versions (bucket rewrites carry them)
        val noop = feed
          .where(col("change_type") === "update" &&
            col("before_image") === col("after_image"))
          .count()
        assert(noop == 0, s"trial $trial: feed carried unchanged rows")
      }
      graft.Fs.deleteRecursively(root)
    }
  }
}
