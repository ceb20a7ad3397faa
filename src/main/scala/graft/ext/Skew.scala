package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * AQE's skew-join handles most runtime skew (enabled by default and left
  * on in [[graft.Sessions]]); explicit salting remains the tool when one
  * join key dominates so heavily that even split partitions of it
  * overwhelm a task, or when a deterministic plan is required (AQE skew
  * handling is size-triggered at runtime).
  */
object Skew {

  /** Salted equi-join: the big (skewed) side sprays each key across
    * `salt` sub-keys; the small side replicates `salt`×. The join result
    * is EXACTLY the plain `big.join(small, key)` inner join — only the
    * shuffle layout changes: a hot key's rows land in `salt` tasks
    * instead of one.
    *
    * Cost model: small side payload × salt extra shuffle volume — use for
    * dimension-sized right sides against fact-sized skew. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    // Deterministic spray: hash of the full row spreads a hot key's rows
    // uniformly without relying on nondeterministic ids.
    val sprayed = big.withColumn("__salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salt)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    sprayed.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** The strategy [[autoSaltedJoin]] settled on — exposed so callers and
    * tests can audit the decision without re-deriving it. */
  sealed trait JoinStrategy
  case object PlainJoin extends JoinStrategy
  case object BroadcastJoin extends JoinStrategy
  final case class SprayJoin(salt: Int) extends JoinStrategy

  /** Pick the join strategy the [[keySkewProfile]] diagnostic implies:
    *
    *  1. small side within `broadcastRowLimit` → BROADCAST (no shuffle of
    *     the big side at all — skew-immune, best whenever legal);
    *  2. else, heaviest key's share ≥ `skewSharePct` → SALTED (spray the
    *     hot key across `salt` tasks);
    *  3. else → plain shuffle join (AQE's size-triggered skew handling
    *     still backstops moderate runtime skew).
    *
    * Runs TWO bounded driver fetches (small-side count, top-1 key share)
    * — an explicit planning cost, amortized against the join it shapes;
    * both go through the guarded [[graft.Client]] fetches. */
  def chooseStrategy(big: DataFrame, small: DataFrame, key: String,
                     broadcastRowLimit: Long = 1000000L,
                     skewSharePct: Double = 20.0,
                     salt: Int = 16): JoinStrategy = {
    val smallRows = graft.Client.fetchScalar[Long](
      small.agg(count(lit(1)).as("__n")), "__n")
    if (smallRows <= broadcastRowLimit) BroadcastJoin
    else {
      val topShare = graft.Client
        .fetchColumn[Double](keySkewProfile(big, key, 1), "share", maxRows = 1)
        .headOption.getOrElse(0.0)
      if (topShare >= skewSharePct) SprayJoin(salt) else PlainJoin
    }
  }

  /** X11 as the remedy, not just the diagnostic: an inner equi-join whose
    * physical shape is chosen from the data ([[chooseStrategy]]). The
    * result is EXACTLY `big.join(small, key)` under every strategy — only
    * the shuffle/replication layout differs. */
  def autoSaltedJoin(big: DataFrame, small: DataFrame, key: String,
                     broadcastRowLimit: Long = 1000000L,
                     skewSharePct: Double = 20.0,
                     salt: Int = 16): DataFrame =
    chooseStrategy(big, small, key, broadcastRowLimit, skewSharePct, salt) match {
      case BroadcastJoin  => big.join(broadcast(small), key)
      case SprayJoin(s)   => saltedJoin(big, small, key, s)
      case PlainJoin      => big.join(small, key)
    }

  /** Key-frequency profile — the diagnostic that decides between AQE,
    * salting, or a broadcast: top-k heaviest keys with their share.
    * One partial-agg pass + TakeOrdered; the total stays IN the plan as
    * a one-row broadcast cross join (a `.count()` here would run a full
    * scan at plan-construction time — the x1EmbedNearDup flaw class). */
  def keySkewProfile(df: DataFrame, key: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
    val total = df.agg(count(lit(1)).as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", round(col("cnt") * lit(100.0) / col("__total"), 3))
      .drop("__total")
      .orderBy(col("cnt").desc, col(key))
      .limit(k)
  }
}
