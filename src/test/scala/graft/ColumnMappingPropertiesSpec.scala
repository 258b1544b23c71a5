package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.warehouse.SnapshotTable

/** ScalaCheck properties for field-id-style column mapping (r16): over
  * random histories of appends, renames, drops, RE-ADDS of dropped
  * names, type widens, keyed MoR deletes, COW deletes, compactions, and
  * expiry, the table must track an in-memory row model exactly — the
  * re-add case is the sharp edge (a re-added name is a NEW column; rows
  * older than the re-add read NULL, never the dropped values), and a
  * final compact must bake the logical schema with no value drift. */
object ColumnMappingPropertiesSpec extends Properties("columnMapping") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each case commits a multi-snapshot estate

  private lazy val spark = SparkSpec.session

  private sealed trait COp
  private case class CAppend(k: Int) extends COp
  private case object CRename extends COp
  private case object CDrop extends COp
  private case object CReAdd extends COp // a NEW column, possibly a dropped name
  private case object CWiden extends COp
  private case class CDelKey(slot: Int) extends COp // MoR eq-delete by id
  private case class CCowDel(slot: Int) extends COp // file-pruned COW delete
  private case object CCompact extends COp
  private case object CExpire extends COp
  private case object CSwap extends COp    // r17 alterColumns: atomic 3-rename swap
  private case object CBatchRW extends COp // r17 alterColumns: rename + widen, one commit

  private val opGen: Gen[COp] = Gen.frequency(
    5 -> Gen.chooseNum(1, 3).map(CAppend),
    3 -> Gen.const(CRename),
    2 -> Gen.const(CDrop),
    2 -> Gen.const(CReAdd),
    2 -> Gen.const(CWiden),
    2 -> Gen.chooseNum(0, 9).map(CDelKey),
    1 -> Gen.chooseNum(0, 9).map(CCowDel),
    1 -> Gen.const(CCompact),
    1 -> Gen.const(CExpire),
    2 -> Gen.const(CSwap),
    2 -> Gen.const(CBatchRW))

  property("reads track the row model through random rename/drop/re-add/" +
    "widen/DML/maintenance histories; compact bakes it") =
    Prop.forAll(Gen.chooseNum(8, 14).flatMap(n => Gen.listOfN(n, opGen))) { ops =>
      import org.apache.spark.sql.functions.{col, lit}
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      val dir = Files.createTempDirectory("colmap-prop").toString
      val t = new SnapshotTable(spark, s"$dir/t")

      // THE MODEL: rows by unique id; each row maps logical column name →
      // value (absent = NULL). cols tracks (name, isLong); dropped names
      // may be re-added as NEW columns.
      var cols = Vector(("c0", false))
      var rows = Map.empty[Long, Map[String, Long]]
      var nextId = 0L
      var nextVal = 0L
      var nextName = 1

      def sparkRows(k: Int): org.apache.spark.sql.DataFrame = {
        val data = (1 to k).map { _ =>
          val id = nextId; nextId += 1
          val vals = cols.map { case (c, _) => c -> { nextVal += 1; nextVal } }
          rows += id -> vals.toMap
          org.apache.spark.sql.Row.fromSeq(id +: vals.map(_._2))
        }
        val schema = StructType(StructField("id", LongType) +:
          cols.map { case (c, _) => StructField(c, LongType) })
        val df = spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](
            scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava), schema)
        // narrow columns carry INT physically until widened
        cols.foldLeft(df) { case (d, (c, isLong)) =>
          if (isLong) d else d.withColumn(c, col(c).cast("int")) }
      }

      t.createOrReplace(sparkRows(3))
      ops.foreach {
        case CAppend(k) => t.append(sparkRows(k))
        case CRename if cols.nonEmpty =>
          val (from, w) = cols(nextName % cols.size)
          val to = s"c$nextName"; nextName += 1
          t.renameColumn(from, to)
          cols = cols.map { case (c, lw) => if (c == from) (to, lw) else (c, lw) }
          rows = rows.view.mapValues(r =>
            r.get(from).fold(r - from)(v => r - from + (to -> v))).toMap
        case CDrop if cols.size > 1 =>
          val (victim, _) = cols(nextName % cols.size)
          t.dropColumn(victim)
          cols = cols.filterNot(_._1 == victim)
          rows = rows.view.mapValues(_ - victim).toMap
        case CReAdd =>
          // re-introduce "c0" (the initial name — by now possibly renamed
          // away or dropped) as a NEW column: the sharpest mapping hazard.
          // Columns materialize by APPENDING data that carries them (there
          // is no ADD COLUMN DDL), so the re-add ships with one row;
          // existing rows lack it → NULL, never the old values.
          val name = "c0"
          if (!cols.exists(_._1 == name)) {
            cols = cols :+ ((name, false))
            t.append(sparkRows(1))
          }
        case CWiden =>
          cols.find(!_._2).foreach { case (c, _) =>
            t.widenColumn(c, "bigint")
            cols = cols.map { case (n, lw) => if (n == c) (n, true) else (n, lw) }
          }
        case CDelKey(slot) =>
          val ids = rows.keys.toSeq.sorted
          if (ids.nonEmpty) {
            import spark.implicits._
            val victim = ids(slot % ids.size)
            t.deleteByKeys(Seq("id"), Seq(victim).toDF("id"))
            rows -= victim
          }
        case CCowDel(slot) =>
          val ids = rows.keys.toSeq.sorted
          if (ids.nonEmpty) {
            val victim = ids(slot % ids.size)
            t.delete(col("id") === lit(victim))
            rows -= victim
          }
        case CCompact => t.compact()
        case CExpire => t.compact(); t.expireSnapshots(keepLast = 1)
        case CSwap if cols.size >= 2 =>
          // ATOMIC SWAP via alterColumns (r17): the 3-rename chain in one
          // marker. Model: physical columns keep their widths and VALUES,
          // only the two NAMES exchange — rows' key a ↔ key b.
          import graft.warehouse.SnapshotTable.ColumnAlter
          val a = cols(nextName % cols.size)._1
          val b = cols((nextName + 1) % cols.size)._1
          nextName += 1
          if (a != b) {
            val tmp = s"cswap$nextName"; nextName += 1
            t.alterColumns(Seq(ColumnAlter.rename(a, tmp),
              ColumnAlter.rename(b, a), ColumnAlter.rename(tmp, b)))
            rows = rows.view.mapValues { r =>
              val va = r.get(a); val vb = r.get(b)
              val r2 = r - a - b
              val r3 = vb.fold(r2)(v => r2 + (a -> v))
              va.fold(r3)(v => r3 + (b -> v))
            }.toMap
            cols = cols.map { case (c, w) =>
              if (c == a) (b, w) else if (c == b) (a, w) else (c, w) }
          }
        case CBatchRW if cols.nonEmpty =>
          // rename + widen of the RENAMED name in ONE commit — in-batch
          // sequencing (op 2 sees op 1's schema)
          import graft.warehouse.SnapshotTable.ColumnAlter
          val (from, wide) = cols(nextName % cols.size)
          val to = s"c$nextName"; nextName += 1
          t.alterColumns(Seq(ColumnAlter.rename(from, to)) ++
            (if (!wide) Seq(ColumnAlter.widen(to, "bigint")) else Nil))
          cols = cols.map { case (c, lw) =>
            if (c == from) (to, true) else (c, lw) }
          rows = rows.view.mapValues(r =>
            r.get(from).fold(r - from)(v => r - from + (to -> v))).toMap
        case _ => ()
      }

      def snapshot(): (Set[String], Map[Long, Map[String, Long]]) = {
        val df = t.read()
        val got = df.collect().map { r =>
          val id = r.getAs[Number](r.fieldIndex("id")).longValue
          id -> df.columns.filter(_ != "id").flatMap { c =>
            val i = r.fieldIndex(c)
            if (r.isNullAt(i)) None else Some(c -> r.getAs[Number](i).longValue)
          }.toMap
        }.toMap
        (df.columns.toSet, got)
      }

      val wantCols = cols.map(_._1).toSet + "id"
      val wantRows = rows
      val (gotCols, gotRows) = snapshot()
      t.compact() // bake the logical schema; nothing may drift
      val (bakedCols, bakedRows) = snapshot()
      (s"live read columns: got $gotCols want $wantCols" |: (gotCols == wantCols)) &&
        (s"live read rows: got $gotRows want $wantRows" |: (gotRows == wantRows)) &&
        (s"baked columns: $bakedCols" |: (bakedCols == wantCols)) &&
        (s"baked rows: $bakedRows" |: (bakedRows == wantRows))
    }
}
