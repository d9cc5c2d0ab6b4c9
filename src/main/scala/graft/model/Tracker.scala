package graft.model

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Per-table CDC progress checkpoint — the engine's streaming state
  * (`incremental_load_orchestration.py:101-127,164-210`): the commit-time
  * upper bound of the last successfully merged batch. Files named strictly
  * after `lastProcessedTime` are the todo frontier.
  */
final case class TableTrackerState(table: String, lastProcessedTime: String) {
  def lastAsDateTime: LocalDateTime =
    LocalDateTime.parse(lastProcessedTime, Tracker.fmt)
}

final case class TrackerState(seq: Long, tables: Seq[TableTrackerState]) {
  def forTable(name: String): TableTrackerState =
    tables.find(_.table == name)
      .getOrElse(TableTrackerState(name, Tracker.epoch))

  def advanced(table: String, to: String): TrackerState =
    copy(tables = tables.filterNot(_.table == table) :+ TableTrackerState(table, to))
}

/** JSON-file persistence for the tracker (the reference keeps the same
  * state as a JSON object in S3, `incremental_load_orchestration.py:264-286`).
  * Writes are atomic (temp file + move) so a crash mid-write can't corrupt
  * the checkpoint — replays are safe anyway because the merge is
  * idempotent, but the state file itself must always parse. */
object Tracker {
  val fmt: DateTimeFormatter = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSS")
  val epoch: String = "1970-01-01T00:00:00.000"

  private implicit val formats: Formats = DefaultFormats

  def load(path: String): TrackerState =
    if (!Files.exists(Paths.get(path))) TrackerState(0L, Nil)
    else JsonMethods.parse(Files.readString(Paths.get(path))).extract[TrackerState]

  def save(path: String, state: TrackerState): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val tmp = Paths.get(path + ".tmp")
    Files.writeString(tmp, Serialization.writePretty(state))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
