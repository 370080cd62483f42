package graft

/** Custom-operator query inventory (as-of/positional joins, LLM-pipeline
  * dedup/similarity/text ops) — populated operator by operator; see
  * `graft.operators` / `graft.functions`.
  */
object OpsEntry {
  def defs: Vector[SparkEntry.QueryDef] = Vector()
}
