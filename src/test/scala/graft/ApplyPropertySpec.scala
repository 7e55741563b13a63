package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Cdc, CdcEvent, CdcRowImages}
import graft.operators.ChangelogApply

/** Property test (SURVEY.md §5): for random event sequences,
  * fullImageMultiset(events) ≡ a direct in-memory multiset fold.
  * (Raw ScalaCheck Gen with fixed seeds — the scalatestplus bridge is not
  * in the offline dependency cache.) */
class ApplyPropertySpec extends AnyFunSuite {
  import SparkTest._

  private val imageGen: Gen[Seq[String]] = for {
    a <- Gen.oneOf("x", "y", "z")
    b <- Gen.oneOf("1", "2", null)
  } yield Seq(a, b)

  private val opGen: Gen[(String, Seq[String], Seq[String])] = for {
    op <- Gen.frequency(
      5 -> Cdc.OpAdd, 3 -> Cdc.OpUpdate, 2 -> Cdc.OpDelete)
    img <- imageGen
    img2 <- imageGen
  } yield op match {
    case Cdc.OpUpdate => (op, img, img2) // before, after
    case _ => (op, null, img)
  }

  private def referenceFold(
      evs: Seq[(String, Seq[String], Seq[String])]): Map[Seq[String], Long] = {
    val state = scala.collection.mutable.Map.empty[Seq[String], Long]
    evs.foreach {
      case (Cdc.OpAdd, _, img) =>
        state(img) = state.getOrElse(img, 0L) + 1
      case (Cdc.OpUpdate, before, after) =>
        state.remove(before).foreach { n =>
          state(after) = state.getOrElse(after, 0L) + n
        }
      case (Cdc.OpDelete, _, img) => state.remove(img)
      case _ => ()
    }
    state.toMap
  }

  test("fullImageMultiset ≡ in-memory multiset fold on random sequences") {
    import spark.implicits._
    (1 to 15).foreach { seed =>
      val evs = Gen.listOfN(40, opGen)
        .apply(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(sys.error("gen failed"))
      val df = evs.zipWithIndex.map { case ((op, before, after), i) =>
        CdcEvent(i.toLong, "flv://m/g/t", "f", i.toLong, op, null,
          Seq("a", "b"), Seq(CdcRowImages(before, after)))
      }.toDS().toDF()
      val got = ChangelogApply.fullImageMultiset(df)
        .select($"image").as[Seq[String]].collect().toSeq
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val want = referenceFold(evs)
      assert(got === want, s"seed $seed")
    }
  }
}
