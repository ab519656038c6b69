package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.VitalsGen

/** Generator-determinism contract (F17/F18/F19 + S7): the synthetic ingest
  * generator must be a pure function of (row id, seed) — identical output
  * at any partition count (so any cluster size regenerates the same data)
  * and identical to the committed snapshot at fixtures/vitalsgen (so drift
  * fails here and at the driver's `gen_vitals_replay` CORRECTNESS row
  * rather than silently shifting downstream tests).
  */
class VitalsGenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select(col("event_id"), col("patient_id"), col("loinc_code"),
        col("code_display"),
        round(col("value_num") * 10).cast("long").as("value_deci"),
        col("unit"), unix_micros(col("effective_ts")).as("ts_us"),
        col("source"), col("raw"))
      .orderBy("ts_us").collect().toSeq

  test("output is invariant to the spark.range partition count") {
    val a = canon(VitalsGen.vitals(spark, 500, 1704067200L, slices = 1))
    val b = canon(VitalsGen.vitals(spark, 500, 1704067200L, slices = 7))
    val c = canon(VitalsGen.vitals(spark, 500, 1704067200L, slices = 32))
    assert(a == b && b == c)
  }

  test("different seeds produce different data (seed actually flows)") {
    val a = canon(VitalsGen.vitals(spark, 200, 1704067200L, seed = 42L))
    val b = canon(VitalsGen.vitals(spark, 200, 1704067200L, seed = 43L))
    assert(a != b)
    // but the schedule and ids are seed-independent by design
    assert(a.map(r => (r.getString(0), r.getLong(6))) ==
      b.map(r => (r.getString(0), r.getLong(6))))
  }

  test("regeneration bit-matches the committed fixture snapshot") {
    val regen = canon(VitalsGen.vitals(spark, VitalsGen.FixtureRows,
      VitalsGen.FixtureStartEpochSec))
    val committed = canon(
      spark.read.parquet(SparkEntry.VitalsFixture + "/vitals"))
    assert(regen.size == VitalsGen.FixtureRows)
    assert(regen == committed)
  }

  test("value distribution honors the uniform(60,100) one-decimal contract") {
    val vals = VitalsGen.vitals(spark, 5000, 1704067200L)
      .select(round(col("value_num") * 10).cast("long").as("d"))
      .collect().map(_.getLong(0))
    assert(vals.min >= 600 && vals.max <= 1000)
    // coarse uniformity: all four quartile bins populated within 2x of even
    val bins = vals.groupBy(d => (d - 600) / 101).view.mapValues(_.size)
    assert(bins.size == 4 && bins.values.forall(n => n > 5000 / 8))
  }
}
