package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scale-safe grouped prefix sums (cumulative totals).
  *
  * The naive form — `sum(v).over(Window.partitionBy(g).orderBy(o))` —
  * shuffles EVERY row of a group into a single task: the classic 100 TB
  * scale-killer when one group (one corpus shard, one tenant, one day) is
  * billions of rows. This operator computes the identical result with a
  * bounded driver step instead:
  *
  *  1. range-partition + sort by (group, order) — one shuffle, the same
  *     shuffle the window would have needed, but spread over ALL partitions
  *     of the range partitioner rather than one task per group;
  *  2. per partition, sum the values of each group slice it holds — a tiny
  *     side output (≤ #partitions + #groups-straddling-boundaries rows,
  *     NOT data-sized) collected to the driver;
  *  3. prefix-sum those slice totals per group on the driver, broadcast the
  *     (partition, group) → starting-offset map, and stream each partition
  *     once more adding a running counter.
  *
  * Two jobs over the sorted data (Spark reuses the exchange for the second
  * pass), no group ever concentrated on one task. Driver state is
  * O(#groups + #partitions) — one slice entry per group plus one per
  * partition boundary a group straddles — NOT O(#partitions): a caller
  * with millions of groups would OOM the driver. A cheap exact slice-count
  * pre-pass over the (checkpointed) sorted frame guards this: above
  * `maxDriverSlices` the operator falls back to the classic
  * `Window.partitionBy(group)` form, which is safe in exactly that regime —
  * high group cardinality means small per-group partitions, so no single
  * task concentrates the data. The two regimes are complementary: few big
  * groups → driver path; many small groups → window path.
  *
  * Requires (group, order) to be unique per row for a deterministic
  * result — true for the (source, doc_id) pipelines this backs.
  */
object RunningTotal {

  /** Append `outCol` = running total of `valueCol` within `groupCol`
    * ordered by `orderCol` (inclusive of the current row). `valueCol` must
    * be integral and NON-NULL (a null value row fails fast rather than
    * silently contributing 0); the running total is a LONG.
    */
  def grouped(df: DataFrame, groupCol: String, orderCol: String,
              valueCol: String, outCol: String): DataFrame =
    grouped(df, groupCol, Seq(orderCol), valueCol, outCol)

  /** As above with a caller-known group-count upper bound (see the full
    * overload) — skips the slice-count pre-pass when the hint proves the
    * driver-state budget. */
  def grouped(df: DataFrame, groupCol: String, orderCol: String,
              valueCol: String, outCol: String,
              groupCountHint: Option[Long]): DataFrame =
    grouped(df, groupCol, Seq(orderCol), valueCol, outCol,
      groupCountHint = groupCountHint)

  /** As above with a COMPOSITE ordering — (group, orderCols...) must be
    * unique per row. Used by interleaving layouts whose within-group order
    * is itself a (rank, tiebreak) pair.
    *
    * @param maxDriverSlices budget for driver-side slice entries
    *   (≈ #groups + #partition straddles). Above it the window fallback
    *   runs instead — identical result, no driver state.
    * @param groupCountHint caller-known upper bound on the number of
    *   distinct groups. When `hint + numPartitions - 1 <= maxDriverSlices`
    *   (slices = groups + at-most-one straddle per partition boundary, so
    *   the bound is sound), the exact slice-count pre-pass is skipped —
    *   saving one full scan for callers whose group cardinality is known
    *   small (a constant group, a bounded source set). An understated hint
    *   fails fast in pass 1 rather than silently OOMing the driver. */
  def grouped(df: DataFrame, groupCol: String, orderCols: Seq[String],
              valueCol: String, outCol: String,
              maxDriverSlices: Long = 1L << 20,
              groupCountHint: Option[Long] = None): DataFrame = {
    require(orderCols.nonEmpty, "RunningTotal: at least one order column")
    require(!df.columns.contains(outCol),
      s"RunningTotal: output column '$outCol' already exists in the input")
    val keys = col(groupCol).asc_nulls_first +:
      orderCols.map(col(_).asc_nulls_first)
    val sorted = df
      .withColumn(valueCol, col(valueCol).cast(LongType))
      .repartitionByRange(keys: _*)
      .sortWithinPartitions(keys: _*)
      .localCheckpoint(true) // both passes read the SAME sorted layout
    val gIdx = sorted.schema.fieldIndex(groupCol)
    val vIdx = sorted.schema.fieldIndex(valueCol)

    // pass 0: EXACT driver-state budget check — count group slices per
    // partition (a local scan of the checkpointed frame returning one long
    // per partition; nothing data-sized moves). Above budget, the window
    // form computes the identical result with zero driver state: in that
    // regime groups are numerous hence small, so per-group window
    // partitions fit a task. Skipped entirely when a caller hint already
    // proves the bound (slices <= hint + partitions - 1).
    val numParts = sorted.rdd.getNumPartitions.toLong
    val hintCovers = groupCountHint.exists(h =>
      h >= 0 && h + math.max(numParts - 1, 0L) <= maxDriverSlices)
    val totalSlices = if (hintCovers) 0L else sorted.rdd.mapPartitions { it =>
      var n = 0L; var cur: Any = null; var open = false
      it.foreach { r =>
        val g = r.get(gIdx)
        if (!open || !java.util.Objects.equals(g, cur)) { n += 1; cur = g; open = true }
      }
      Iterator.single(n)
    }.collect().sum
    if (totalSlices > maxDriverSlices) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(groupCol))
        .orderBy(orderCols.map(col(_).asc_nulls_first): _*)
      // preserve the driver path's fail-fast-on-null contract
      val checked = when(col(valueCol).isNull, raise_error(lit(
        "RunningTotal: null value encountered; filter or default nulls first")))
        .otherwise(col(valueCol))
      return sorted.withColumn(outCol, sum(checked).over(w))
    }

    // pass 1: per-partition, per-group slice sums, in slice order
    val sliceSums: Array[(Int, Array[(Any, Long)])] =
      sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
        val out = collection.mutable.ArrayBuffer.empty[(Any, Long)]
        var cur: Any = null
        var sum = 0L
        var open = false
        it.foreach { r =>
          val g = r.get(gIdx)
          if (!open || !java.util.Objects.equals(g, cur)) {
            if (open) out += ((cur, sum))
            cur = g; sum = 0L; open = true
          }
          if (r.isNullAt(vIdx))
            throw new IllegalArgumentException(
              "RunningTotal: null value encountered; filter or default nulls first")
          sum += r.getLong(vIdx)
          if (out.size > maxDriverSlices) // a lying groupCountHint fails
            throw new IllegalArgumentException( // fast, executor-side
              s"RunningTotal: groupCountHint understated the group count " +
                s"(partition $pid alone exceeds maxDriverSlices=$maxDriverSlices)")
        }
        if (open) out += ((cur, sum))
        Iterator.single((pid, out.toArray))
      }.collect() // bounded: one entry per (partition, group-slice)
    val collectedSlices = sliceSums.iterator.map(_._2.length.toLong).sum
    require(collectedSlices <= maxDriverSlices + numParts,
      s"RunningTotal: groupCountHint understated the group count " +
        s"($collectedSlices slices collected, budget $maxDriverSlices)")

    // driver prefix-sum: offset for (pid, g) = totals of g in partitions < pid
    val running = collection.mutable.Map.empty[Any, Long]
    val offsets = collection.mutable.Map.empty[(Int, Any), Long]
    sliceSums.sortBy(_._1).foreach { case (pid, slices) =>
      slices.foreach { case (g, s) =>
        val before = running.getOrElse(g, 0L)
        offsets((pid, g)) = before
        running(g) = before + s
      }
    }
    val bc = sorted.sparkSession.sparkContext.broadcast(offsets.toMap)

    // pass 2: stream each partition adding the running counter
    val outSchema = sorted.schema.add(outCol, LongType, nullable = false)
    val rows = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      var cur: Any = null
      var run = 0L
      var open = false
      it.map { r =>
        val g = r.get(gIdx)
        if (!open || !java.util.Objects.equals(g, cur)) {
          cur = g; run = bc.value.getOrElse((pid, g), 0L); open = true
        }
        run += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    sorted.sparkSession.createDataFrame(rows, outSchema)
  }
}
