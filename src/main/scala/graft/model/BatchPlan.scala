package graft.model

import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** The incremental job's input plan — the reference serializes "what files
  * does this batch process, per table" as a sequence-numbered JSON document
  * and hands it to the compute job
  * (`incremental_load_orchestration.py:23-55,325-340`: `GlueJobInput` /
  * `GlueJobInputTable`). The plan IS the query: a bounded, explicit file
  * list per table with the time range it covers.
  *
  * @param startAfter ISO datetime key: files strictly after this bound
  * @param endUntil   commit-time upper bound of the last file taken — the
  *                   checkpoint to advance to once the batch succeeds
  */
final case class TableTodo(
    table: String, startAfter: String, endUntil: String, files: Seq[String])

final case class BatchPlan(seq: Long, todos: Seq[TableTodo]) {
  def filename: String = TimeCodec.seqToFilename(seq) + ".json"
}

object BatchPlan {
  private implicit val formats: Formats = DefaultFormats

  /** Round-trippable JSON serde (reference tests its plan serde the same
    * way, `tests/test_incremental_load_orchestration.py:12-28`). */
  def toJson(plan: BatchPlan): String = Serialization.writePretty(plan)

  def fromJson(json: String): BatchPlan =
    JsonMethods.parse(json).extract[BatchPlan]
}
