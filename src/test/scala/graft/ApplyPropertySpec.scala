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

  // ---- schema-aware apply: random DDL interleaved with DML ----

  private sealed trait SEv
  private case class SDdl(sql: String) extends SEv
  private case class SRow(op: String, before: Seq[String], after: Seq[String]) extends SEv

  private val ddlGen: Gen[SDdl] = Gen.frequency(
    3 -> Gen.const(SDdl("ALTER TABLE t ADD COLUMN c_extra INT")),
    2 -> Gen.const(SDdl("ALTER TABLE t DROP COLUMN b")),
    1 -> Gen.const(SDdl("ALTER TABLE t RENAME COLUMN a TO a2")))

  /** Oracle fold with the follower-MySQL DDL semantics: ALTER ADD widens
    * all live images with the null cell, DROP narrows at the column's
    * current index, RENAME touches names only. */
  private def schemaFold(evs: Seq[SEv]): (Seq[String], Map[Seq[String], Long]) = {
    var cols = Seq("a", "b")
    val state = scala.collection.mutable.Map.empty[Seq[String], Long]
    evs.foreach {
      case SDdl(sql) =>
        if (sql.contains("ADD COLUMN") && !cols.contains("c_extra")) {
          cols = cols :+ "c_extra"
          val widened = state.toSeq.map { case (k, n) => (k :+ (null: String), n) }
          state.clear(); state ++= widened
        } else if (sql.contains("DROP COLUMN") && cols.contains("b")) {
          val i = cols.indexOf("b")
          cols = cols.patch(i, Nil, 1)
          val narrowed = state.toSeq
            .groupBy { case (k, _) => k.patch(i, Nil, 1) }
            .map { case (k, xs) => (k, xs.map(_._2).sum) }
          state.clear(); state ++= narrowed
        } else if (sql.contains("RENAME COLUMN") && cols.contains("a")) {
          cols = cols.map(c => if (c == "a") "a2" else c)
        }
      case SRow(Cdc.OpAdd, _, img) =>
        val padded = img.padTo(cols.length, null: String).take(cols.length)
        state(padded) = state.getOrElse(padded, 0L) + 1
      case SRow(Cdc.OpUpdate, before, after) =>
        val b = before.padTo(cols.length, null: String).take(cols.length)
        val a = after.padTo(cols.length, null: String).take(cols.length)
        state.remove(b).foreach(n => state(a) = state.getOrElse(a, 0L) + n)
      case SRow(Cdc.OpDelete, _, img) =>
        val k = img.padTo(cols.length, null: String).take(cols.length)
        state.remove(k)
      case _ => ()
    }
    (cols, state.toMap)
  }

  test("applyWithSchema ≡ in-memory schema-aware fold on random DDL+DML sequences") {
    import spark.implicits._
    (1 to 10).foreach { seed =>
      val mixed: Gen[SEv] = Gen.frequency(
        8 -> opGen.map { case (op, b, a) => SRow(op, b, a) },
        2 -> ddlGen)
      val raw = Gen.listOfN(40, mixed)
        .apply(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(sys.error("gen failed"))
      // Keep only DDL applicable to the running schema (MySQL rejects a
      // duplicate ADD / double DROP), and pad row images to the width in
      // force at event time — exactly what real binlog row events carry.
      var cols = Seq("a", "b")
      val evs = scala.collection.mutable.ArrayBuffer.empty[SEv]
      val engine = scala.collection.mutable.ArrayBuffer.empty[CdcEvent]
      raw.foreach {
        case d @ SDdl(sql) =>
          val ok =
            if (sql.contains("ADD")) !cols.contains("c_extra")
            else if (sql.contains("DROP")) cols.contains("b")
            else cols.contains("a")
          if (ok) {
            cols =
              if (sql.contains("ADD")) cols :+ "c_extra"
              else if (sql.contains("DROP")) cols.patch(cols.indexOf("b"), Nil, 1)
              else cols.map(x => if (x == "a") "a2" else x)
            evs += d
            engine += CdcEvent(engine.length.toLong, "flv://m/g", "f",
              engine.length.toLong, Cdc.OpQuery, sql, null, null)
          }
        case SRow(op, b, a) =>
          def pad(s: Seq[String]) =
            if (s == null) null
            else s.padTo(cols.length, null: String).take(cols.length)
          evs += SRow(op, pad(b), pad(a))
          engine += CdcEvent(engine.length.toLong, "flv://m/g/t", "f",
            engine.length.toLong, op, null, null,
            Seq(CdcRowImages(pad(b), pad(a))))
      }
      val prefixed =
        (CdcEvent(-1L, "flv://m/g", "f", -1L, Cdc.OpQuery,
          "CREATE TABLE t (a INT, b INT)", null, null) +: engine.toSeq)
          .toDS().toDF()
      val st = ChangelogApply.applyWithSchema(prefixed, nullCell = null)
      val gotCols = st.select($"columns").as[Seq[String]].collect().headOption
      val got = st.select($"image").as[Seq[String]].collect().toSeq
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val (wantCols, want) = schemaFold(evs.toSeq)
      assert(got === want, s"seed $seed")
      if (want.nonEmpty) assert(gotCols.get === wantCols, s"seed $seed cols")
      // malformed-event guards on a CLEAN stream: nothing quarantined
      // (registry-resolved widths always match here) and the guarded
      // apply is byte-identical to the unguarded one
      val (passed, quar) = graft.operators.CdcGuards.partition(prefixed)
      assert(quar.isEmpty, s"seed $seed: clean stream must not quarantine")
      val gotGuarded = ChangelogApply.applyWithSchema(passed, nullCell = null)
        .select($"image").as[Seq[String]].collect().toSeq
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      assert(gotGuarded === want, s"seed $seed guarded")
    }
  }

  test("applySchemaStreamKeyed ≡ applyWithSchema on random keyed DDL+DML (single batch)") {
    // The keyed streaming path's exactness contract: rows unique in the
    // final-schema projection (first cell is a key) and updates/deletes
    // targeting live rows — every well-formed keyed binlog. Under those
    // preconditions the per-image streamed fold must reproduce the batch
    // serial fold bit-for-bit, DDL included.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    (1 to 5).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      var cols = Seq("k", "v")
      var curName = "t" // RENAME TABLE flips the live identity t <-> t2
      val live = scala.collection.mutable.LinkedHashMap.empty[String, Seq[String]]
      val events = scala.collection.mutable.ArrayBuffer.empty[CdcEvent]
      events += CdcEvent(0L, "flv://m/g", "f", 0L, Cdc.OpQuery,
        "CREATE TABLE t (k INT, v INT)", null, null)
      var seqNo = 1L
      def row(op: String, b: Seq[String], a: Seq[String]): Unit = {
        events += CdcEvent(seqNo, s"flv://m/g/$curName", "f", seqNo, op, null, null,
          Seq(CdcRowImages(b, a)))
        seqNo += 1
      }
      def ddl(sql: String): Unit = {
        events += CdcEvent(seqNo, "flv://m/g", "f", seqNo, Cdc.OpQuery,
          sql, null, null)
        seqNo += 1
      }
      (1 to 40).foreach { _ =>
        rnd.nextInt(11) match {
          case 0 if !cols.contains("extra") =>
            ddl(s"ALTER TABLE $curName ADD COLUMN extra INT")
            cols = cols :+ "extra"
            live.mapValuesInPlace((_, img) => img :+ (null: String))
          case 1 if cols.contains("v") =>
            ddl(s"ALTER TABLE $curName DROP COLUMN v")
            val i = cols.indexOf("v")
            cols = cols.patch(i, Nil, 1)
            live.mapValuesInPlace((_, img) => img.patch(i, Nil, 1))
          case 2 if cols.contains("v") =>
            ddl(s"ALTER TABLE $curName RENAME COLUMN v TO v2")
            cols = cols.map(c => if (c == "v") "v2" else c)
          case 3 => // verbatim passthrough: rows wiped, columns kept
            ddl(s"TRUNCATE TABLE $curName")
            live.clear()
          case 4 if rnd.nextInt(4) == 0 =>
            if (rnd.nextBoolean()) {
              // drop + recreate: generation bump with a SCHEMA reset
              // (the other wipe path the keyed timeline must replay
              // identically to the serial fold)
              ddl(s"DROP TABLE $curName")
              ddl(s"CREATE TABLE $curName (k INT, v INT)")
            } else {
              // verbatim DROP DATABASE: every table of the db wiped,
              // then the current name re-created as a FRESH instance
              ddl("DROP DATABASE g")
              ddl(s"CREATE TABLE $curName (k INT, v INT)")
            }
            cols = Seq("k", "v")
            live.clear()
          case 10 => // verbatim RENAME TABLE: state survives, name flips
            val next = if (curName == "t") "t2" else "t"
            ddl(s"RENAME TABLE $curName TO $next")
            curName = next
          case n if n < 6 =>
            val k = s"k${rnd.nextInt(20)}"
            if (!live.contains(k)) {
              val img = k +: Seq.fill(cols.length - 1)(rnd.nextInt(3).toString)
              row(Cdc.OpAdd, null, img)
              live(k) = img
            }
          case n if n < 8 => // update a live row's non-key cells
            if (live.nonEmpty) {
              val k = live.keys.toSeq(rnd.nextInt(live.size))
              val before = live(k)
              val after = k +: Seq.fill(cols.length - 1)(rnd.nextInt(3).toString)
              row(Cdc.OpUpdate, before, after)
              live(k) = after
            }
          case _ => // delete a live row with its current full image
            if (live.nonEmpty) {
              val k = live.keys.toSeq(rnd.nextInt(live.size))
              row(Cdc.OpDelete, null, live(k))
              live.remove(k)
            }
        }
      }

      val batchDf = events.toSeq.toDS().toDF()
      def multiset(df: org.apache.spark.sql.DataFrame) = df
        .select($"tbl", $"image", $"columns")
        .as[(String, Seq[String], Seq[String])]
        .collect().toSeq.groupBy(identity).view.mapValues(_.size).toMap
      val batchOut = multiset(
        ChangelogApply.applyWithSchema(batchDf, nullCell = null))

      val input = MemoryStream[CdcEvent]
      val name = s"prop_keyed_$seed"
      val q = graft.streaming.CdcStream
        .applySchemaStreamKeyed(input.toDF(), batchDf, nullCell = null)
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      input.addData(events.toSeq: _*)
      q.processAllAvailable(); q.stop()
      val streamOut = multiset(spark.table(name))
      assert(streamOut === batchOut, s"seed $seed")

      // the SERIAL streaming twin (FMGWS keyed by table instance) must
      // replay the same log to the same state — renames and db drops
      // included via the identity side input
      val input2 = MemoryStream[CdcEvent]
      val name2 = s"prop_serial_$seed"
      val q2 = graft.streaming.CdcStream
        .applySchemaStream(input2.toDF(), batchDf, nullCell = null)
        .writeStream.format("memory").queryName(name2)
        .outputMode("append").start()
      input2.addData(events.toSeq: _*)
      q2.processAllAvailable(); q2.stop()
      val serialOut = multiset(spark.table(name2))
      assert(serialOut === batchOut, s"seed $seed serial")
    }
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
