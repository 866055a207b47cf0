package graft.sources

/** Marker the SQL DML planner strategy ([[graft.plans.VtDml]]) keys
  * on: a catalog [[org.apache.spark.sql.connector.catalog.Table]]
  * whose mutations route through [[graft.operators.VersionedTable]]'s
  * transactional verbs. `vtPath` is the versioned-table root the verbs
  * operate on. Implemented by [[VtCatalog]]'s latest-version table
  * (time-travel tables stay read-only and never carry this trait). */
trait VtWritableTable {
  def vtPath: String

  /** The committed version this table object resolved at load. */
  def vtVersion: Int

  /** Why this version's PLAIN file scan would lie (deletion vectors
    * to mask / mapped columns to alias), or None when a plain scan is
    * exact. When set, [[graft.plans.VtMaskedScanRewrite]] rewrites the
    * relation onto the masking logical plan so SQL SELECT stays
    * correct; without the rule the scan refuses at materialization
    * ([[VtScanGuard]]). */
  def vtScanRefusal: Option[String]
}
