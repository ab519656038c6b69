package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic content-hash surrogate keys.
  *
  * The reference derives every dimension key as `TO_HEX(SHA256(natural_key))`
  * (reference sql/bq_dim_patient.sql:3, bq_dim_code.sql:3, bq_dim_unit.sql:3,
  * bq_dim_source.sql:3) — order-independent and re-derivable on every rebuild,
  * which is what makes its hourly CTAS snapshots idempotent. Spark's
  * `sha2(_, 256)` already returns lowercase hex, matching BQ's `TO_HEX`.
  *
  * Scale note: content hashes need no coordination (no sequence / no
  * monotonically_increasing_id skew), so dimension builds stay embarrassingly
  * parallel at any cluster size.
  */
object Keys {
  /** sha256 hex of the column's string form — the engine's surrogate key. */
  def surrogateKey(c: Column): Column = sha2(c.cast("string"), 256)
}
