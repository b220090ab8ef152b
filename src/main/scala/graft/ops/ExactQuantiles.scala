package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT interpolated percentiles per group, computed by distributed
  * selection instead of per-group buffering.
  *
  * Spark's exact `percentile()` aggregate materializes every value of
  * a group in ONE task's memory (an ObjectHashAggregate buffer), then
  * sorts it single-threaded — the aggregate equivalent of the
  * unsplittable window partition: at 100 TB a popular group is tens
  * of gigabytes in one JVM. This operator keeps every stage bounded:
  *
  *   1. per-group count/min/max (map-side-combinable);
  *   2. each row maps to one of `bands` equal-width value bands —
  *      a (group, column, band) COUNT histogram (hash aggregate, no
  *      buffers);
  *   3. a ≤`bands`-row-per-(group, column) prefix sum locates, for
  *      each target rank `1 + p·(n−1)` (its floor and ceil), the
  *      single band containing it;
  *   4. only the rows of LOCATED bands (~n/bands each under any
  *      roughly-even spread) are ranked — a window over band-sized
  *      partitions, never group-sized;
  *   5. the ranked values at the two indices interpolate with
  *      Spark's own formula
  *      `lower·(highIdx − pos) + higher·(pos − lowIdx)`, so results
  *      are bit-identical to `percentile()` (and to the DuckDB
  *      `quantile_cont` oracle that formula already hash-matches).
  *
  * ALL target columns ride the same scans: one stats aggregate, one
  * histogram pass, one candidate pass (each a posexplode into
  * (group, column, value) long form) — asking for three percentiles
  * over two columns costs the same three scans as one percentile
  * over one column, where a per-column composition would multiply
  * the fixed stage cost by the column count.
  *
  * Constant groups (min = max) short-circuit: every percentile IS
  * that value — no candidate scan, and the all-values-equal band
  * degeneracy cannot arise.
  *
  * PATHOLOGICAL VALUE CONCENTRATION (round 10, opt-in via
  * `maxDepth > 1`): a group whose values pile into one narrow band
  * that still spans distinct values would keep that band's rank
  * partition large. With recursion enabled, a located band whose
  * count exceeds `bandRowBound` RECURSES instead of ranking: its
  * rows re-band over the band's own (tighter) min/max, the target
  * rank shifts to the within-band rank `i − cb`, and the same
  * locate-or-recurse step repeats. Each level divides the value
  * range by `bands` (or hits the all-values-equal short-circuit,
  * whose answer needs no ranking at all), so the partition a window
  * ever sorts is bounded by max(n/bands^maxDepth, bandRowBound) —
  * the final level ranks whatever remains, preserving exactness.
  * The levels run as a DRIVER LOOP over localCheckpoint'd level
  * inputs, not an unrolled plan: a blind `maxDepth`-deep plan
  * re-expands the whole upstream at every reference (measured
  * minutes of planning on a 3k-row spec), where the loop executes
  * only the levels the data actually needs — zero extra levels on
  * well-spread data — at the cost of per-level eager actions, which
  * is why the dial is opt-in rather than default: the default plan
  * is byte-identical to the depth-1 form.
  *
  * Null values are excluded per column (the `percentile()`
  * contract); null GROUPS are excluded by the keyed joins — callers
  * with nullable group keys should coalesce first.
  */
object ExactQuantiles {

  /** Histogram rows (groups × columns × bands) at or under this
    * broadcast freely; above it the per-group relations are joined by
    * SHUFFLE instead — a high-cardinality group key at 1024 bands
    * would otherwise push a multi-GB broadcast to every executor.
    * ~4M rows ≈ 100 MB serialized, inside Spark's comfort zone. */
  val MaxBroadcastHistRows: Long = 4000000L

  /** A located band with more rows than this recurses instead of
    * ranking: 4M doubles ≈ 32 MB per window-sort task. */
  val BandRowBound: Long = 4000000L

  /** @param targets (valueColumn, percentiles) pairs
    * @param maxBroadcastHistRows gate for the broadcast-vs-shuffle
    *        decision on the per-group relations (see
    *        [[MaxBroadcastHistRows]]); the gate itself costs one
    *        count of the group-stats aggregate — an eager action, so
    *        like `Similarity.resolvePqCodebook`'s count this operator
    *        should not be assembled under a pending `observe()`
    * @param bandRowBound located bands above this row count recurse
    *        (see class doc) when `maxDepth > 1`
    * @param maxDepth total locate levels (≥ 1); 1 = today's
    *        single-locate plan (the default — no extra actions);
    *        raise it for pathological value concentration. The last
    *        level ranks whatever remains, so exactness never
    *        depends on it.
    * @param directRowBound small-input gate (r14): when the largest
    *        COLUMN TOTAL (non-null values summed over every group —
    *        read from the stats aggregate the gate action already
    *        runs) is at most this many values, the whole call
    *        computes as ONE sorted-buffer hash aggregate instead of
    *        the banded machinery. The direct path runs the banded
    *        plan's own flat short-circuit and interpolation
    *        expressions over the two order statistics, so values are
    *        bit-identical by construction in every case (spec-pinned,
    *        including the null-group flat asymmetry), and the gate
    *        bounds BOTH the per-group buffer and the shuffled bytes
    *        by what one band-sort task already accepts. The bound is
    *        on totals, not max group, because at scale a small-group
    *        input is still terabytes the banded histogram would
    *        never shuffle raw. −1 (default) = follow `bandRowBound`;
    *        0 = always banded. MEMORY-CLASS caveat (r15 advice): a
    *        band-SORT task can spill to disk mid-sort, but the direct
    *        path's collect_list aggregation buffer cannot spill
    *        MID-GROUP — at the shared default (4M values ≈ 32 MB+
    *        per group) the two paths bound the same rows but not the
    *        same resident memory. Callers on memory-tight executors
    *        should pass an explicit smaller directRowBound rather
    *        than raising bandRowBound alone.
    * @return (grp, vcol, p, value) — one row per group × target
    */
  def percentiles(df: DataFrame, grp: String,
      targets: Seq[(String, Seq[Double])],
      bands: Int = 1024,
      maxBroadcastHistRows: Long = MaxBroadcastHistRows,
      bandRowBound: Long = BandRowBound,
      maxDepth: Int = 1,
      directRowBound: Long = -1L): DataFrame = {
    require(targets.nonEmpty, "percentiles: no targets")
    require(bands > 1, s"percentiles: need bands > 1, got $bands")
    require(maxDepth >= 1, s"percentiles: need maxDepth >= 1, got $maxDepth")
    require(bandRowBound >= 1, s"percentiles: bad bandRowBound $bandRowBound")
    require(directRowBound >= -1L,
      s"percentiles: bad directRowBound $directRowBound")
    // -1 = follow bandRowBound: the direct path's per-group buffer
    // bound IS the bound the caller already accepted for one band
    // sort task; 0 = always banded (the spec's plan-shape pins)
    val dBound = if (directRowBound < 0) bandRowBound else directRowBound
    targets.foreach { case (vcol, ps) =>
      require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
        s"percentiles($vcol): p must be in [0,1], got $ps")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val vcols = targets.map(_._1)
    val nm = vcols.indices.map(i => s"__v$i")
    val base = df.select(col(grp).as("__g") +:
      vcols.zipWithIndex.map { case (c, i) =>
        col(c).cast("double").as(nm(i)) }: _*)

    // ONE stats aggregate for every column: per-column non-null
    // count (the percentile() null contract) + min + max
    val stats = base.groupBy(col("__g")).agg(
      count(col(nm.head)).as("__n0"),
      (Seq(min(col(nm.head)).as("__lo0"), max(col(nm.head)).as("__hi0")) ++
        vcols.indices.drop(1).flatMap(i => Seq(
          count(col(nm(i))).as(s"__n$i"),
          min(col(nm(i))).as(s"__lo$i"),
          max(col(nm(i))).as(s"__hi$i")))): _*)
    // long form: (g, cid, n, lo, hi)
    val statsLong = stats.select(col("__g"),
      posexplode(array(vcols.indices.map(i => struct(
        col(s"__n$i").as("n"), col(s"__lo$i").as("lo"),
        col(s"__hi$i").as("hi"))): _*)).as(Seq("__cid", "__s")))
      .select(col("__g"), col("__cid"), col("__s.n").as("__n"),
        col("__s.lo").as("__lo"), col("__s.hi").as("__hi"))
      .filter(col("__n") > 0)

    val tps = targets.zipWithIndex.flatMap { case ((_, ps), i) =>
      ps.map(p => (i, p)) }.toDF("__cid", "__p")
    val tg = statsLong.join(broadcast(tps), Seq("__cid"))
      .withColumn("__pos",
        lit(1.0) + (col("__n") - 1).cast("double") * col("__p"))
      .withColumn("__li", floor(col("__pos")).cast("long"))
      .withColumn("__hi2", ceil(col("__pos")).cast("long"))

    // constant groups: every percentile is the single value
    val flat = tg.filter(col("__lo") === col("__hi"))
      .select(col("__g"), col("__cid"), col("__p"),
        col("__lo").as("__val"))
    val varied = tg.filter(col("__lo") < col("__hi"))

    // Size gate — ONE action over the stats aggregate decides TWO
    // strategy choices (values are identical on every side of both
    // gates; spec-pinned):
    //  - direct-vs-banded: when the largest COLUMN TOTAL is at most
    //    `directRowBound` values, the whole input is within what ONE
    //    band-sort task already accepts (step 4 ranks up to
    //    max(n/bands, bandRowBound) rows in one task) — the ~8-stage
    //    banded machinery buys nothing, so one sorted-buffer hash
    //    aggregate replaces it. The gate reads totals, not the max
    //    group, because a small-group input at 100 TB is still
    //    terabytes that the direct aggregate would shuffle raw where
    //    the banded histogram shuffles counts. Like AQE, the
    //    strategy comes from a runtime size, never a constant tuned
    //    to one scale.
    //  - broadcast-vs-shuffle on the per-group relations (stats row
    //    per group, the (group × column × band) histogram, the
    //    located-band set), as before.
    val gateRow = stats.agg(count(lit(1)).as("__ng"),
      nm.indices.map(i => sum(col(s"__n$i")))
        .reduce((a, b) => greatest(a, b)).as("__tot")).head()
    val nGroups = gateRow.getLong(0)
    val maxColTotal = if (gateRow.isNullAt(1)) 0L else gateRow.getLong(1)
    if (maxColTotal <= dBound) {
      // direct path: ONE hash aggregate buffers each group's sorted
      // non-null values (collect_list + sort_array), then the banded
      // plan's OWN flat short-circuit and interpolation expressions
      // run over the two order statistics — bit-identical by
      // construction in every case the banded plan covers, including
      // the null-group asymmetry (flat rows keep null groups, the
      // keyed joins drop varied ones) and duplicate-adjacent-rank
      // interpolation, where builtin percentile() short-circuits to
      // the value while the banded formula interpolates (a last-ulp
      // difference the oracle hashes would notice). get() is 0-based
      // and null-safe, so empty (all-null) columns fall out as null
      // values, mirroring statsLong's n > 0 filter.
      val qcols = targets.zipWithIndex.flatMap { case ((vc, ps), i) =>
        ps.map(p => (i, vc, p)) }
      val aggs = nm.indices.map(i =>
        sort_array(collect_list(col(nm(i)))).as(s"__a$i"))
      val entries = qcols.map { case (i, vc, p) =>
        val a = col(s"__a$i")
        val n = size(a)
        val pos = lit(1.0) + (n - 1).cast("double") * lit(p)
        val li = floor(pos).cast("long")
        val hi2 = ceil(pos).cast("long")
        val lo = get(a, lit(0))
        val hi = get(a, n - 1)
        val lv = get(a, (li - 1).cast("int"))
        val hv = get(a, (hi2 - 1).cast("int"))
        val v = when(lo === hi, lo)
          .when(li === hi2, lv)
          .otherwise(lv * (hi2.cast("double") - pos) +
            hv * (pos - li.cast("double")))
        struct(lit(vc).as("vcol"), lit(p).as("p"),
          when(n > 0 && (col("__g").isNotNull || lo === hi), v)
            .as("value"))
      }
      return base.groupBy(col("__g")).agg(aggs.head, aggs.tail: _*)
        .select(col("__g"),
          posexplode(array(entries: _*)).as(Seq("__x", "__e")))
        .filter(col("__e.value").isNotNull)
        .select(col("__g").as(grp), col("__e.vcol").as("vcol"),
          col("__e.p").as("p"), col("__e.value").as("value"))
    }
    val smallHist =
      nGroups * vcols.size.toLong * bands.toLong <= maxBroadcastHistRows
    def maybeB(d: DataFrame): DataFrame = if (smallHist) broadcast(d) else d

    // ONE banding pass for every column: stats joined back onto
    // the base scan, rows explode to (g, cid, v, band) long form
    val statsB = maybeB(stats)
    val bandExpr: Int => Column = { i =>
      least(lit(bands - 1), floor((col(nm(i)) - col(s"__lo$i")) /
        ((col(s"__hi$i") - col(s"__lo$i")) / lit(bands.toDouble)))
        .cast("int"))
    }
    val bandedLong = base.join(statsB, Seq("__g"))
      .select(col("__g"), posexplode(array(vcols.indices.map(i =>
        struct(lit(i).as("cid"), col(nm(i)).as("v"),
          when(col(nm(i)).isNotNull && col(s"__lo$i") < col(s"__hi$i"),
            bandExpr(i)).otherwise(lit(-1)).as("b"))): _*))
        .as(Seq("__x", "__e")))
      .select(col("__g"), col("__e.cid").as("__cid"),
        col("__e.v").as("__v"), col("__e.b").as("__b"))
      .filter(col("__b") >= 0)

    // (group, column, band) histogram + exclusive prefix count —
    // ≤ bands rows per (group, column) window partition
    val wPrev = Window.partitionBy(col("__g"), col("__cid"))
      .orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bc = bandedLong.groupBy(col("__g"), col("__cid"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cb", coalesce(sum(col("__c")).over(wPrev), lit(0L)))

    // locate the band holding each needed index: band covers global
    // ranks (cb, cb + c]. The match is an EQUI-join on (group,
    // column) with the rank-range as a post-join filter — each need
    // row meets ≤ bands candidates — so it plans as a hash join
    // under BOTH strategies (the old non-equi broadcast form would
    // have degraded to a nested loop in shuffle mode)
    val need = varied.select(col("__g"), col("__cid"), col("__p"),
      col("__pos"), col("__li"), col("__hi2"),
      explode(array(col("__li"), col("__hi2"))).as("__i"))
      .distinct() // integer pos ⇒ li == hi2 explodes to one row, not two
    val loc = need.join(
      maybeB(bc.select(col("__g").as("__g3"), col("__cid").as("__c3"),
        col("__b"), col("__c"), col("__cb"))),
      col("__g") === col("__g3") && col("__cid") === col("__c3"))
      .filter(col("__cb") < col("__i") &&
        col("__i") <= col("__cb") + col("__c"))

    // split: bands small enough rank NOW; oversized bands recurse
    // (unless this is the only level, where ranking is the contract)
    val canRecurse = maxDepth > 1
    val resolveNow =
      if (canRecurse) loc.filter(col("__c") <= bandRowBound) else loc
    // rank ONLY the located bands' rows; partition size ≈ n/bands,
    // and with recursion on, never above bandRowBound
    val wanted = resolveNow.select(col("__g"), col("__cid"), col("__b"))
      .distinct()
    val wRank = Window.partitionBy(col("__g"), col("__cid"), col("__b"))
      .orderBy(col("__v"))
    val ranked = bandedLong.join(maybeB(wanted),
        Seq("__g", "__cid", "__b"))
      .withColumn("__rn", row_number().over(wRank))
    val at = resolveNow.join(ranked.select(col("__g").as("__g4"),
        col("__cid").as("__c4"), col("__b").as("__b4"), col("__rn"),
        col("__v")),
      col("__g") === col("__g4") && col("__cid") === col("__c4") &&
        col("__b") === col("__b4") &&
        col("__i") === col("__cb") + col("__rn"))
      .select(col("__g"), col("__cid"), col("__p"), col("__pos"),
        col("__li"), col("__hi2"), col("__i"), col("__v"))

    val atAll =
      if (!canRecurse) at
      else {
        // DRIVER LOOP over checkpointed level inputs (see class doc):
        // each level's frames are small plans over the previous
        // checkpoint, and the loop stops the moment nothing pends
        val pending = loc.filter(col("__c") > bandRowBound)
        var pendTargets = pending.select(col("__g"), col("__cid"),
          col("__b").cast("string").as("__key"), col("__p"),
          col("__pos"), col("__li"), col("__hi2"),
          col("__i").as("__i0"),
          (col("__i") - col("__cb")).as("__i"))
          .localCheckpoint()
        var out = at
        if (!pendTargets.isEmpty) {
          val pendBands = pending
            .select(col("__g"), col("__cid"), col("__b")).distinct()
          var pendRows = bandedLong
            .join(maybeB(pendBands), Seq("__g", "__cid", "__b"))
            .select(col("__g"), col("__cid"),
              col("__b").cast("string").as("__key"), col("__v"))
            .localCheckpoint()
          var depthLeft = maxDepth - 1
          var doneLoop = false
          while (!doneLoop) {
            val lvl = resolveLevel(pendRows, pendTargets, bands,
              bandRowBound, lastLevel = depthLeft <= 1)
            out = out.unionByName(lvl.resolved)
            depthLeft -= 1
            if (depthLeft <= 0) doneLoop = true
            else {
              val nt = lvl.nextTargets.localCheckpoint()
              if (nt.isEmpty) doneLoop = true
              else {
                pendTargets = nt
                pendRows = lvl.nextRows.localCheckpoint()
              }
            }
          }
        }
        out
      }

    // Spark Percentile's interpolation, verbatim:
    // lower·(highIdx − pos) + higher·(pos − lowIdx); integer pos ⇒
    // the single value
    val interp = atAll.groupBy(col("__g"), col("__cid"), col("__p"),
        col("__pos"), col("__li"), col("__hi2"))
      .agg(max(when(col("__i") === col("__li"), col("__v"))).as("__lv"),
        max(when(col("__i") === col("__hi2"), col("__v"))).as("__hv"))
      .select(col("__g"), col("__cid"), col("__p"),
        when(col("__li") === col("__hi2"), col("__lv"))
          .otherwise(
            col("__lv") * (col("__hi2").cast("double") - col("__pos")) +
              col("__hv") * (col("__pos") - col("__li").cast("double")))
          .as("__val"))

    val names = vcols.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("__cid", "vcol")
    interp.unionByName(flat)
      .join(broadcast(names), Seq("__cid"))
      .select(col("__g").as(grp), col("vcol"),
        col("__p").as("p"), col("__val").as("value"))
  }

  /** One level's output: targets resolved AT this level, plus the
    * next level's inputs (empty when nothing pended). */
  private final case class Level(resolved: DataFrame,
      nextRows: DataFrame, nextTargets: DataFrame)

  /** One level of the narrow-band resolver: rows/targets are keyed
    * by (__g, __cid, __key) where __key is the band path so far;
    * `__i` is the 1-based rank of the wanted value WITHIN that key's
    * rows, and `__i0` the ORIGINAL global rank (what the caller's
    * interpolation matches against __li/__hi2). With `lastLevel`
    * every located band resolves by ranking regardless of size, so
    * exactness never depends on the depth budget.
    *
    * All bookkeeping relations here are bounded by targets × bands
    * per level (only oversized bands reach a deeper level), so they
    * broadcast unconditionally; the data rows join by the band-path
    * key. The all-values-equal short-circuit (klo == khi) answers
    * duplicate pileups without ranking — the case no amount of
    * re-banding can shrink. */
  private def resolveLevel(rows: DataFrame, targets: DataFrame,
      bands: Int, bandRowBound: Long, lastLevel: Boolean): Level = {
    val keyCols = Seq(col("__g"), col("__cid"), col("__key"))
    val stats = rows.groupBy(keyCols: _*)
      .agg(min(col("__v")).as("__klo"), max(col("__v")).as("__khi"))
    val t2 = targets.join(broadcast(stats), Seq("__g", "__cid", "__key"))
    val flatK = t2.filter(col("__klo") === col("__khi"))
      .select(col("__g"), col("__cid"), col("__p"), col("__pos"),
        col("__li"), col("__hi2"), col("__i0").as("__i"),
        col("__klo").as("__v"))
    val variedK = t2.filter(col("__klo") < col("__khi"))

    val banded = rows.join(broadcast(stats), Seq("__g", "__cid", "__key"))
      .filter(col("__klo") < col("__khi"))
      .select(col("__g"), col("__cid"), col("__key"), col("__v"),
        least(lit(bands - 1),
          floor((col("__v") - col("__klo")) /
            ((col("__khi") - col("__klo")) / lit(bands.toDouble))))
          .cast("int").as("__b"))
    val wPrev = Window.partitionBy(col("__g"), col("__cid"), col("__key"))
      .orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bcK = banded
      .groupBy(col("__g"), col("__cid"), col("__key"), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__cb", coalesce(sum(col("__c")).over(wPrev), lit(0L)))
    val locK = variedK.join(broadcast(
        bcK.select(col("__g").as("__g3"), col("__cid").as("__c3"),
          col("__key").as("__k3"), col("__b"), col("__c"), col("__cb"))),
      col("__g") === col("__g3") && col("__cid") === col("__c3") &&
        col("__key") === col("__k3"))
      .filter(col("__cb") < col("__i") &&
        col("__i") <= col("__cb") + col("__c"))

    val resolveNow =
      if (lastLevel) locK else locK.filter(col("__c") <= bandRowBound)
    val wantedK = resolveNow
      .select(col("__g"), col("__cid"), col("__key"), col("__b"))
      .distinct()
    val wRank = Window
      .partitionBy(col("__g"), col("__cid"), col("__key"), col("__b"))
      .orderBy(col("__v"))
    val ranked = banded
      .join(broadcast(wantedK), Seq("__g", "__cid", "__key", "__b"))
      .withColumn("__rn", row_number().over(wRank))
    val atK = resolveNow.join(ranked.select(col("__g").as("__g4"),
        col("__cid").as("__c4"), col("__key").as("__k4"),
        col("__b").as("__b4"), col("__rn"), col("__v")),
      col("__g") === col("__g4") && col("__cid") === col("__c4") &&
        col("__key") === col("__k4") && col("__b") === col("__b4") &&
        col("__i") === col("__cb") + col("__rn"))
      .select(col("__g"), col("__cid"), col("__p"), col("__pos"),
        col("__li"), col("__hi2"), col("__i0").as("__i"), col("__v"))

    val pending =
      if (lastLevel) locK.limit(0) else locK.filter(col("__c") > bandRowBound)
    val pendBands = pending
      .select(col("__g"), col("__cid"), col("__key"), col("__b"))
      .distinct()
    val nextRows = banded
      .join(broadcast(pendBands), Seq("__g", "__cid", "__key", "__b"))
      .select(col("__g"), col("__cid"),
        concat(col("__key"), lit("/"), col("__b")).as("__key"),
        col("__v"))
    val nextTargets = pending.select(col("__g"), col("__cid"),
      concat(col("__key"), lit("/"), col("__b")).as("__key"),
      col("__p"), col("__pos"), col("__li"), col("__hi2"),
      col("__i0"),
      (col("__i") - col("__cb")).as("__i"))
    Level(flatK.unionByName(atK), nextRows, nextTargets)
  }
}
