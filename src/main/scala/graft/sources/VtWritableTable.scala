package graft.sources

/** Marker the SQL DML planner strategy ([[graft.plans.VtDml]]) keys
  * on: a catalog [[org.apache.spark.sql.connector.catalog.Table]]
  * whose mutations route through [[graft.operators.VersionedTable]]'s
  * transactional verbs. `vtPath` is the versioned-table root the verbs
  * operate on. Implemented by [[VtCatalog]]'s latest-version table
  * (time-travel tables stay read-only and never carry this trait). */
trait VtWritableTable {
  def vtPath: String
}
