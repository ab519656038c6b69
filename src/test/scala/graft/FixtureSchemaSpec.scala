package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Schema sentinel for every fixture table (VERDICT r10 item 5): the
  * round-9 incident was a driver-side fixture regeneration silently
  * re-typing `events.ts` (ns → µs-NTZ), which surfaced as 16 downstream
  * query failures instead of one named breakage. `Tables.events` now
  * normalizes and fails loudly for `ts`; this spec extends the contract to
  * every table — the next physical re-type of ANY fixture column turns
  * into exactly one failing test naming the table and the drifted column.
  *
  * Asserting on the NORMALIZED logical schema (through the Tables
  * accessors, under the session's pinned reader confs) is deliberate: it is
  * the schema every operator downstream actually consumes.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  /** table → expected `name:type` list in column order (simpleString types). */
  private val expected: Seq[(String, org.apache.spark.sql.DataFrame, String)] = Seq(
    ("events", Tables.events(spark, dir),
      "event_id:bigint,ts:timestamp,user_id:bigint,event_type:string,value:double,props:string"),
    ("lineitem", Tables.lineitem(spark, dir),
      "l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int," +
        "l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double," +
        "l_returnflag:string,l_linestatus:string,l_shipdate:timestamp"),
    ("orders", Tables.orders(spark, dir),
      "o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double," +
        "o_orderdate:timestamp,o_orderpriority:string"),
    ("customer", Tables.customer(spark, dir),
      "c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string"),
    ("supplier", Tables.supplier(spark, dir),
      "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double"),
    ("part", Tables.part(spark, dir),
      "p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double"),
    ("nation", Tables.nation(spark, dir),
      "n_nationkey:int,n_name:string,n_regionkey:int"),
    ("region", Tables.region(spark, dir),
      "r_regionkey:int,r_name:string"),
    ("documents", Tables.documents(spark, dir),
      "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint"),
    ("embeddings", Tables.embeddings(spark, dir),
      "vec_id:bigint,embedding:array<float>,label:int"),
    // committed repo fixtures consumed by oracled queries (same contract:
    // a regeneration that re-types a column fails ONE named test)
    ("media/pixel_blobs",
      spark.read.parquet(s"${SparkEntry.MediaFixture}/pixel_blobs"),
      "doc_id:bigint,kind:string,media:binary"),
    ("media/expected_pixels",
      spark.read.parquet(s"${SparkEntry.MediaFixture}/expected_pixels"),
      "doc_id:bigint,width:int,height:int,n_pixels:bigint," +
        "sum_r:bigint,sum_g:bigint,sum_b:bigint,max_r:int,max_g:int,max_b:int"),
    ("pca/components",
      spark.read.parquet(s"${SparkEntry.PcaFixture}/components"),
      "comp:int,w:array<double>,mu_dot_w:double,eigenvalue:double"),
    ("pca/mean",
      spark.read.parquet(s"${SparkEntry.PcaFixture}/mean"),
      "j:int,mu:double"),
    ("vitalsgen/vitals",
      spark.read.parquet(s"${SparkEntry.VitalsFixture}/vitals"),
      "event_id:string,patient_id:string,loinc_code:string,code_display:string," +
        "value_num:double,unit:string,effective_ts:timestamp,source:string,raw:string"),
  )

  private def render(df: org.apache.spark.sql.DataFrame): String =
    df.schema.fields
      .map(f => s"${f.name}:${f.dataType.simpleString}")
      .mkString(",")

  for ((name, df, want) <- expected)
    test(s"$name keeps its normalized logical schema") {
      val got = render(df)
      assert(got == want,
        s"\nfixture table `$name` drifted:\n  got      $got\n  expected $want\n" +
          "— a driver-side fixture regeneration changed a physical type; " +
          "extend the Tables normalization (see Tables.events) or update " +
          "this pin if the change is intended")
    }

  test("events.ts timezone semantics: normalized instants match epoch micros") {
    // the ns→µs / NTZ→LTZ normalization must preserve the instant under the
    // pinned UTC session — spot-check that unix_micros of the min ts equals
    // DuckDB's convention (µs since epoch, no offset): it must be an exact
    // µs value inside the fixture's 2024 date range
    import org.apache.spark.sql.functions._
    val us = Tables.events(spark, dir)
      .agg(min(unix_micros(col("ts")))).head().getLong(0)
    assert(us > 1500000000000000L && us < 1900000000000000L,
      s"events.ts instants off after normalization: min unix_micros = $us")
  }
}
