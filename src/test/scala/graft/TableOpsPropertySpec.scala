package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.pipeline.Upsert

/** Adversarial properties for the row-level table surgery: against random
  * tables and predicates, DELETE WHERE must equal the SQL filter (null
  * semantics included), UPDATE WHERE must equal the CASE map, and neither
  * may disturb rows outside the predicate — the partition-granular
  * copy-on-write rewrite is an implementation detail the result must not
  * reveal.
  */
object TableOpsPropertySpec extends Properties("graft-table-ops") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // rows: (day ∈ d0..d3, id unique, version nullable) — nulls exercise the
  // SQL CHECK/DELETE null paths; duplicate-free ids keep sets comparable
  private val tableGen: Gen[List[(String, Long, Option[Long])]] =
    Gen.choose(1, 24).flatMap { n =>
      Gen.sequence[List[(String, Long, Option[Long])], (String, Long, Option[Long])](
        (1 to n).map { i =>
          for {
            d <- Gen.choose(0, 3)
            v <- Gen.option(Gen.choose(-50L, 50L))
          } yield (s"d$d", i.toLong, v)
        })
    }

  private val thresholdGen: Gen[Long] = Gen.choose(-40L, 40L)

  private def build(rows: List[(String, Long, Option[Long])]): String = {
    val path = Files.createTempDirectory("graft-prop-t").toString + "/t"
    val df = rows.toDF("day", "id", "version")
    Upsert.replacePartitionsAtomic(spark, df, path, "day",
      rows.map(_._1).distinct.sorted)
    path
  }

  private def readBack(path: String): Set[(String, Long, Option[Long])] = {
    // a fully-deleted table has no data entries and refuses the read —
    // model that as the empty set
    val hasData = graft.streaming.AtomicRenameCommitter.readManifest(path)
      .exists(e => !e._1.startsWith("__"))
    if (!hasData) Set.empty
    else Upsert.readTable(spark, path)
      .as[(String, Long, Option[Long])].collect().toSet
  }

  property("deleteWhere ≡ SQL filter (delete only TRUE; NULL rows survive)") =
    forAll(tableGen, thresholdGen) { (rows, t) =>
      val path = build(rows)
      val s = Upsert.deleteWhere(spark, path, "day", col("version") > t)
      val expected = rows.filterNot(_._3.exists(_ > t)).toSet
      val deletedExpected = rows.count(_._3.exists(_ > t))
      readBack(path) == expected && s.deletedRows == deletedExpected
    }

  property("updateWhere ≡ CASE map (update only TRUE; everything else byte-identical)") =
    forAll(tableGen, thresholdGen) { (rows, t) =>
      val path = build(rows)
      val s = Upsert.updateWhere(spark, path, "day", col("version") > t,
        Map("version" -> (col("version") * -1)))
      val expected = rows.map { case (d, i, v) =>
        (d, i, if (v.exists(_ > t)) v.map(-_) else v)
      }.toSet
      readBack(path) == expected && s.updatedRows == rows.count(_._3.exists(_ > t))
    }

  property("delete-then-complement-delete empties exactly the non-null rows") =
    forAll(tableGen, thresholdGen) { (rows, t) =>
      val path = build(rows)
      Upsert.deleteWhere(spark, path, "day", col("version") > t)
      Upsert.deleteWhere(spark, path, "day", col("version") <= t)
      // both predicates are NULL on null-version rows → only those remain
      val expected = rows.filter(_._3.isEmpty).toSet
      val remaining =
        if (expected.isEmpty)
          // a fully-emptied table has no data entries; readTable refuses
          Upsert.constraints(path).isEmpty &&
            !graft.streaming.AtomicRenameCommitter.readManifest(path)
              .exists(e => !e._1.startsWith("__"))
        else readBack(path) == expected
      remaining
    }
}
