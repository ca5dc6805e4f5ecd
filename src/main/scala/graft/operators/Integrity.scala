package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Table-integrity operators: cheap replica/sync verification between two
 * copies of a keyed table (a snapshot and its replica, a migration source
 * and target, yesterday's backup and today's restore).
 */
object Integrity {

  /**
   * Per-bucket content checksums: rows hash to `buckets` groups by key, and
   * each bucket reduces to (row count, sum of per-row md5-derived 60-bit
   * fingerprints). Summation is order- and partitioning-independent, and
   * md5 is engine-portable — so two tables with equal content produce
   * bit-equal checksum rows on ANY engine.
   *
   * Scale shape: one map-side hash + one `buckets`-row aggregate per table
   * — verification I/O is a full scan but the comparison payload is O(buckets),
   * which is what makes cross-datacenter sync checks affordable: ship 16
   * rows, not 100 TB. The 2^60-bounded fingerprints are summed as
   * DECIMAL(38,0) — exact to 10^38, i.e. ~10^20 rows per bucket, so the
   * checksum never overflows or loses associativity (a plain BIGINT sum
   * overflows at just 8 rows × 2^60).
   *
   * @param fingerprint deterministic per-row content expression (e.g.
   *   `concat_ws("|", key, decimal-rendered cols)`) — the caller controls
   *   which columns participate and how floats are rendered.
   */
  def bucketChecksums(df: DataFrame, keyCol: String, fingerprint: Column,
      buckets: Int = 16): DataFrame = {
    require(buckets > 0, s"buckets $buckets must be positive")
    df.select(pmod(col(keyCol), lit(buckets.toLong)).cast("int").as("bucket"),
        PortableHash.hash60(fingerprint).as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(col("h").cast("decimal(38,0)")).as("checksum"))
  }

  /**
   * Sync check: per-bucket row counts and checksum equality between two
   * keyed tables — drifted buckets surface with `in_sync = false`, telling
   * an incremental repair exactly WHICH key ranges to re-copy (the
   * Merkle-style narrowing used by anti-entropy protocols, one level deep).
   */
  /**
   * Referential-conformance audit over a set of FK relationships: for each
   * (child, parent) pair, the child row count and how many child rows have
   * NO matching parent key (orphans) — the data-quality gate a warehouse
   * runs after every load, as ONE report frame. NULL child keys follow SQL
   * FK semantics: they are counted in `n_child` but are NOT violations.
   * NULL PARENT keys are dropped from the lookup set before the join, so
   * the result equals a `NOT IN (SELECT k FROM parent WHERE k IS NOT
   * NULL)` oracle on every input — without the filter, a single NULL
   * parent key would make raw `NOT IN` report zero orphans for the whole
   * child (three-valued logic), a trap this operator deliberately avoids.
   *
   * Scale shape: ONE pass over each child — a LEFT OUTER join against the
   * de-duplicated parent key set (hash or broadcast as AQE sizes it)
   * feeds a single aggregate producing both counts; orphan rows never
   * materialize wider than the key. Relations union into an
   * O(#relations)-row report.
   */
  def fkConformance(relations: Seq[(String, DataFrame, DataFrame)]): DataFrame = {
    require(relations.nonEmpty, "need at least one (name, childKeys, parentKeys)")
    relations.map { case (name, childKeys, parentKeys) =>
      val keyCols = childKeys.columns.toSeq
      val parent = parentKeys.toDF(keyCols: _*)
        .filter(keyCols.map(col(_).isNotNull).reduce(_ && _))
        .distinct()
        .withColumn("_parent_present", lit(1))
      val keyNotNull = keyCols.map(col(_).isNotNull).reduce(_ && _)
      childKeys.join(parent, keyCols, "left_outer")
        .agg(count(lit(1)).as("n_child"),
          // coalesce: SUM over an empty child is NULL, and the report
          // convention is zeros on an empty corpus (oracle emits 0)
          coalesce(sum(when(col("_parent_present").isNull && keyNotNull, 1L)
            .otherwise(0L)), lit(0L)).as("n_orphans"))
        .select(lit(name).as("relation"), col("n_child"), col("n_orphans"))
    }.reduce(_ unionByName _)
  }

  /**
   * Targeted repair diff — the anti-entropy step AFTER [[syncCheck]]: for
   * the buckets whose counts/checksums drifted, the exact keys to re-copy,
   * each tagged `only_src` / `only_dst` / `changed`. In-sync buckets never
   * reach the key-level join, so the repair payload (and the join) scales
   * with the DRIFT, not the table — re-ship a few keys, not 100 TB.
   *
   * Scale shape: per-key 60-bit fingerprints are map-side over each scan;
   * the drifted-bucket set is an O(buckets) frame broadcast into left-semi
   * prunes of both sides; the full-outer key join runs only over drifted
   * buckets' rows. (On a lake laid out WITH a bucket column the semi join
   * becomes partition pruning and the healthy data is never read at all.)
   */
  def repairDiff(src: DataFrame, dst: DataFrame, keyCol: String,
      fingerprint: DataFrame => Column, buckets: Int = 16): DataFrame = {
    val keyed = (df: DataFrame) =>
      df.select(pmod(col(keyCol), lit(buckets.toLong)).cast("int").as("bucket"),
        col(keyCol).as("k"), PortableHash.hash60(fingerprint(df)).as("h"))
    val a = keyed(src)
    val b = keyed(dst)
    val drifted = syncCheck(src, dst, keyCol, fingerprint, buckets)
      .filter(!col("in_sync")).select("bucket")
    val aDrift = a.join(broadcast(drifted), Seq("bucket"), "left_semi")
      .withColumnsRenamed(Map("h" -> "h_src"))
    val bDrift = b.join(broadcast(drifted), Seq("bucket"), "left_semi")
      .withColumnsRenamed(Map("h" -> "h_dst"))
    aDrift.join(bDrift, Seq("bucket", "k"), "full_outer")
      .filter(!col("h_src").eqNullSafe(col("h_dst")))
      .select(col("bucket"), col("k"),
        when(col("h_dst").isNull, "only_src")
          .when(col("h_src").isNull, "only_dst")
          .otherwise("changed").as("status"))
  }

  /** Benford's-law expected first-digit rates, in exact ppm — fixed
    * mathematical constants (`log10(1 + 1/d) · 1e6`, truncated), hardcoded
    * so NO runtime `log` runs on either engine: libm `log10` is not
    * bit-portable, a literal table is. */
  private[graft] val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  /**
   * BENFORD first-digit audit — the fraud/synthetic-data smoke test over a
   * financial or measurement column: naturally-occurring multiplicative
   * quantities put digit d first with probability log10(1+1/d); a column
   * that deviates hard was rounded, capped, or fabricated. Input is exact
   * integer units (cents — callers stage doubles through DECIMAL, the
   * repo-standard float-exactness pattern); the leading digit is taken
   * from the integer's decimal string (no float log anywhere), observed
   * rates are integer ppm, and expected rates are the hardcoded
   * [[BenfordPpm]] constants, so the report is engine-exact.
   *
   * Scale shape: ONE scan, map-side digit extraction, a 9-row hash
   * aggregate with map-side combine, and a broadcast of the 9-row expected
   * table — nothing here grows with the corpus.
   */
  def benfordAudit(df: DataFrame, amountUnits: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val expected = BenfordPpm.toDF("digit", "exp_ppm")
    val counts = df.select(amountUnits.cast("long").as("__amt"))
      .filter(col("__amt").isNotNull && col("__amt") > 0)
      .select(substring(col("__amt").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("__tot"))
    // the 9-row expected spine drives: digits absent from the data still
    // report (n = 0, full negative deviation) instead of vanishing
    expected.join(counts, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        coalesce(expr("n * 1000000 DIV __tot"), lit(0L)).as("obs_ppm"),
        col("exp_ppm"))
      .withColumn("dev_ppm", col("obs_ppm") - col("exp_ppm"))
  }

  /**
   * ORDER-SENSITIVE audit hash chain per ledger partition (day): the
   * checksum `Σ rank·hash60(row) mod p` (p = 2³¹−1, Mersenne prime)
   * over rows ranked by their canonical order — reordering, dropping, or
   * editing ANY row changes the chain, where [[bucketChecksums]]'s plain
   * hash SUM is order-blind by design (reconciliation wants that;
   * tamper-evidence does not). All arithmetic is BIGINT modular: ranks
   * and hashes reduce mod p BEFORE multiplying (each product < 2⁶² — no
   * overflow), and the per-term-reduced sum stays below rows·p, so the
   * chain holds exactly for partitions up to ~4·10⁹ rows — far past any
   * daily ledger partition — with zero decimal/float anywhere.
   *
   * Scale shape: one exchange on the partition key; the rank window and
   * the checksum aggregate share it, and the output is |partitions| rows.
   */
  def auditHashChain(df: DataFrame, partCol: Column, fingerprint: Column,
      orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(orderCols.nonEmpty, "need a canonical row order for the chain")
    df.select(partCol.as("part") +: PortableHash.hash60(fingerprint).as("__h") +:
        orderCols.zipWithIndex.map { case (c, i) => c.as(s"__o$i") }: _*)
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("part"))
          .orderBy(orderCols.indices.map(i => col(s"__o$i")): _*)))
      .groupBy("part")
      .agg(count(lit(1)).as("n_rows"),
        expr("SUM(((__rk % 2147483647) * (__h % 2147483647)) % 2147483647)" +
          " % 2147483647").as("chain_mod"))
  }

  def syncCheck(src: DataFrame, dst: DataFrame, keyCol: String,
      fingerprint: DataFrame => Column, buckets: Int = 16): DataFrame = {
    val a = bucketChecksums(src, keyCol, fingerprint(src), buckets)
      .withColumnsRenamed(Map("n" -> "n_src", "checksum" -> "sum_src"))
    val b = bucketChecksums(dst, keyCol, fingerprint(dst), buckets)
      .withColumnsRenamed(Map("n" -> "n_dst", "checksum" -> "sum_dst"))
    a.join(b, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_src"), lit(0L)).as("n_src"),
        coalesce(col("n_dst"), lit(0L)).as("n_dst"),
        (col("n_src").eqNullSafe(col("n_dst")) &&
          col("sum_src").eqNullSafe(col("sum_dst"))).as("in_sync"))
  }

  /**
   * DELETION-IMPACT manifest — the right-to-be-forgotten preflight: given
   * a key set to erase, how many rows in each downstream table reference
   * it (directly or through a join path)? The manifest is what a
   * compliance run reviews and signs BEFORE any destructive delete
   * executes; row counts per table are also the cost estimate for the
   * delete job itself.
   *
   * Each entry is (table label, table frame, key column): the frame may
   * already be a join (e.g. lineitem reached through orders) — the
   * operator only counts rows whose key semi-joins the forget set.
   *
   * Scale shape: the forget-key frame is deduplicated once and BROADCAST
   * into a left-semi join per table — each table is scanned exactly once,
   * only its key column is read (columnar pruning), and nothing shuffles:
   * the output is |tables| rows of counts. A forget set too large to
   * broadcast is a bulk purge, not a forget request (stated bound, like
   * the dedup caps).
   */
  /**
   * COMPLETENESS GRID audit — which (time slot × dimension) cells that
   * SHOULD have data don't? The ingestion-gap detector: a feed that went
   * dark for three hours shows up as three missing cells long before any
   * aggregate drifts. Expected cells = the full hourly spine (global min
   * to max slot) × every observed dimension value; a cell is missing when
   * no row lands in it.
   *
   * Scale shape: the corpus collapses to DISTINCT observed cells in one
   * map-side-combined exchange; the expected grid is a |slots|-row spine
   * cross-joined with the broadcast |dims| frame (both bounded, never
   * corpus-sized); missing = one anti join grid-vs-observed, and the
   * report is |dims| rows with exact ppm coverage.
   */
  def completenessGrid(df: DataFrame, tsCol: String, dimCol: String): DataFrame = {
    val observed = df.filter(col(tsCol).isNotNull && col(dimCol).isNotNull)
      .select(date_trunc("hour", col(tsCol)).as("slot"), col(dimCol).as("dim"))
      .distinct()
      // cached: spine bounds, the anti join, and the per-dim rollup all
      // read it. Caller-managed lifecycle — see bucketChecksums' siblings.
      .cache()
    val bounds = observed.agg(min(col("slot")).as("__t0"), max(col("slot")).as("__t1"))
    val spine = bounds
      .select(explode(expr("sequence(__t0, __t1, interval 1 hour)")).as("slot"))
    val dims = observed.select(col("dim")).distinct()
    val grid = spine.crossJoin(broadcast(dims))
    val missing = grid.join(observed, Seq("slot", "dim"), "left_anti")
      .groupBy("dim").agg(count(lit(1)).as("n_missing"))
    grid.groupBy("dim").agg(count(lit(1)).as("n_expected"))
      .join(missing, Seq("dim"), "left")
      .select(col("dim"), col("n_expected"),
        coalesce(col("n_missing"), lit(0L)).as("n_missing"),
        expr("(n_expected - coalesce(n_missing, 0)) * 1000000 DIV n_expected")
          .as("coverage_ppm"))
  }

  /**
   * DOMAIN-OVERLAP census between two key columns — the "do these
   * actually join?" preflight: distinct-value counts on each side, the
   * shared count, each side's exclusive count, and the Jaccard overlap in
   * exact ppm. Run BEFORE building a pipeline on an assumed relationship
   * — a 30% overlap means the join silently drops most of both sides,
   * which no downstream metric will confess to.
   *
   * Scale shape: both columns collapse to distinct values (map-side
   * partials), one full-outer hash join of the two VALUE frames, one
   * 3-counter aggregate. Output is 1 row. NULLs are excluded — NULL
   * never joins, so it is not part of either domain.
   */
  def domainOverlap(a: DataFrame, aCol: String,
      b: DataFrame, bCol: String): DataFrame = {
    val av = a.filter(col(aCol).isNotNull).select(col(aCol).as("__v")).distinct()
      .withColumn("__ina", lit(1))
    val bv = b.filter(col(bCol).isNotNull).select(col(bCol).as("__v")).distinct()
      .withColumn("__inb", lit(1))
    av.join(bv, Seq("__v"), "full")
      .agg(sum(when(col("__ina").isNotNull && col("__inb").isNull, 1L)
        .otherwise(0L)).as("only_a"),
        sum(when(col("__ina").isNull && col("__inb").isNotNull, 1L)
          .otherwise(0L)).as("only_b"),
        sum(when(col("__ina").isNotNull && col("__inb").isNotNull, 1L)
          .otherwise(0L)).as("both"))
      .select(
        (col("only_a") + col("both")).as("n_a"),
        (col("only_b") + col("both")).as("n_b"),
        col("both"), col("only_a"), col("only_b"),
        expr("both * 1000000 DIV (only_a + only_b + both)").as("jaccard_ppm"))
  }

  /**
   * DATA-FRESHNESS report — per stream/dimension, how stale is the newest
   * row relative to the freshest dimension anywhere in the table? The
   * "is feed X behind?" dashboard: lag is measured against the table's
   * own high-water mark (not wall clock — batch data has no reliable
   * "now"), in whole seconds, with dimensions beyond `maxLagSeconds`
   * flagged.
   *
   * Scale shape: one map-side-combined (dim → max ts) aggregate; the
   * global high-water mark re-aggregates the |dims| frame and broadcasts.
   */
  def freshnessReport(df: DataFrame, tsCol: String, dimCol: String,
      maxLagSeconds: Long = 3600L): DataFrame = {
    require(maxLagSeconds >= 0, "maxLagSeconds must be non-negative")
    val dimMax = df.filter(col(tsCol).isNotNull && col(dimCol).isNotNull)
      .groupBy(col(dimCol).as("dim"))
      .agg(max(expr(s"unix_micros($tsCol) DIV 1000000")).as("__m"))
    val hwm = dimMax.agg(max(col("__m")).as("__h"))
    dimMax.crossJoin(broadcast(hwm))
      .select(col("dim"),
        expr("CAST(to_timestamp(__m) AS STRING)").as("newest"),
        (col("__h") - col("__m")).as("lag_seconds"),
        when(col("__h") - col("__m") > maxLagSeconds, 1).otherwise(0).as("stale"))
      .orderBy("dim")
  }

  /**
   * CROSS-FIELD RECONCILIATION audit — does the denormalized header total
   * actually equal what its lines sum to? Per parent: the relative gap
   * between the header amount and the line aggregate, in exact ppm,
   * rolled into bands (exact / <1% / <5% / <20% / ≥20%): the invariant
   * check that catches partial writes, currency drift, and "someone
   * updated the header by hand" — silently poisoned aggregates come from
   * exactly this class of skew.
   *
   * Scale shape: one exchange collapses lines to per-parent sums (the
   * header value rides `max` — constant per parent after the join); the
   * banding is row-local, the census ≤ 5 rows. Cents end to end.
   */
  def reconciliationAudit(df: DataFrame, parentCol: String,
      headerCents: Column, lineCents: Column): DataFrame = {
    val per = df.filter(col(parentCol).isNotNull)
      .groupBy(col(parentCol))
      .agg(max(headerCents.cast("decimal(18,0)")).cast("long").as("__h"),
        sum(lineCents.cast("decimal(18,0)")).cast("long").as("__l"))
      .filter(col("__h") > 0)
      .withColumn("__ppm", expr("abs(__h - __l) * 1000000 DIV __h"))
    per
      .withColumn("band",
        when(col("__ppm") === 0, "0_exact")
          .when(col("__ppm") < 10000, "1_under_1pct")
          .when(col("__ppm") < 50000, "2_under_5pct")
          .when(col("__ppm") < 200000, "3_under_20pct")
          .otherwise("4_over_20pct"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_parents"), max(col("__ppm")).as("max_gap_ppm"))
      .orderBy("band")
  }

  /**
   * FUNCTIONAL-DEPENDENCY audit — for each candidate determinant→dependent
   * column pair, how many determinant values map to MORE than one distinct
   * dependent value. `violation_ppm = 0` certifies the FD holds on this
   * snapshot (safe to normalize / use as a lookup key); anything else
   * quantifies how broken the assumed dependency is — the schema-design
   * check profilers skip because it needs a per-value distinct count, not
   * a column histogram.
   *
   * Scale shape: per candidate pair, one (det, dep) distinct collapse
   * followed by a det-keyed count — both shuffle on the determinant and
   * combine map-side; the report is |pairs| rows unioned from bounded
   * single-row aggregates. Nothing is quadratic and no pair reads another
   * pair's shuffle.
   *
   * NULL semantics: rows with a NULL determinant or dependent are excluded
   * (a NULL key determines nothing; a NULL value is absence, not a second
   * witness) — mirroring fkConformance's NULL-FK treatment.
   */
  def functionalDependencyAudit(df: DataFrame,
      pairs: Seq[(String, String)]): DataFrame = {
    require(pairs.nonEmpty, "functionalDependencyAudit needs at least one pair")
    pairs.map { case (det, dep) =>
      df.filter(col(det).isNotNull && col(dep).isNotNull)
        .select(col(det).as("__det"), col(dep).as("__dep"))
        .distinct()
        .groupBy("__det")
        .agg(count(lit(1)).as("__ndep"))
        .agg(count(lit(1)).as("n_det_values"),
          sum(when(col("__ndep") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          col("n_det_values"), col("n_violating"),
          expr("n_violating * 1000000 DIV n_det_values").as("violation_ppm"))
    }.reduce(_ unionAll _)
  }

  /**
   * INTEGER HEADROOM audit — per integral column: the maximum absolute
   * value, its exact bit length, and whether the column still fits
   * INT32/INT16. The downcast-safety check before a storage rewrite
   * (half the width = half the scan at 100 TB for key columns), and the
   * overflow early-warning when a key sequence is drifting toward its
   * type ceiling. Bit length is `length(bin(max_abs))` — exact, never a
   * float log.
   *
   * Scale shape: ONE aggregate row over the table computing every
   * column's max(abs) with map-side partials, unpivoted to |columns|
   * rows. All-NULL and empty columns report 0 bits (nothing to store
   * needs no width).
   */
  def integerHeadroomAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "integerHeadroomAudit needs at least one column")
    val maxes = cols.map(c =>
      max(abs(col(c).cast("long"))).as(s"__m_$c"))
    val row = df.agg(maxes.head, maxes.tail: _*)
    val stacked = cols.map(c => s"'$c', coalesce(__m_$c, 0L)").mkString(", ")
    row.select(expr(s"stack(${cols.size}, $stacked) AS (column_name, max_abs)"))
      .select(col("column_name"), col("max_abs"),
        when(col("max_abs") > 0, length(bin(col("max_abs"))))
          .otherwise(lit(0)).cast("int").as("bits_used"))
      .withColumn("fits_int16",
        (col("max_abs") <= Short.MaxValue.toLong).cast("int"))
      .withColumn("fits_int32",
        (col("max_abs") <= Int.MaxValue.toLong).cast("int"))
      .orderBy("column_name")
  }

  /**
   * MISSINGNESS-PATTERN census — the JOINT distribution of NULLs: which
   * COMBINATIONS of columns go missing together, with counts and ppm.
   * Per-column null rates (x94) cannot distinguish "5 % of rows lost the
   * whole enrichment block" from "independent 5 % dropouts per column" —
   * but imputation strategy, MCAR/MAR reasoning, and root-causing a
   * broken upstream join all depend on exactly that difference. The
   * pattern key is the comma-joined list of missing column names (empty
   * string = complete row), built row-local from compile-time names.
   *
   * Scale shape: one codegen'd map-side pass computing the pattern
   * string, one aggregate bounded by 2^|cols| patterns (|cols| is a
   * handful by contract), one broadcast total. No windows, no joins.
   */
  def missingnessPatterns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "missingnessPatterns needs at least one column")
    val pattern = concat_ws(",",
      cols.map(c => when(col(c).isNull, lit(c))): _*)
    val pats = df.select(pattern.as("missing_cols"))
      .groupBy("missing_cols").agg(count(lit(1)).as("n_rows"))
    val tot = pats.agg(sum(col("n_rows")).as("__t"))
    pats.crossJoin(broadcast(tot))
      .select(col("missing_cols"), col("n_rows"),
        expr("n_rows * 1000000 DIV __t").as("share_ppm"))
      .orderBy("missing_cols")
  }

  /**
   * ID-CONTINUITY census — key-space fill rates per fixed-width id block
   * (`key DIV blockSize`), rolled into fill-ppm bands: the
   * "did we lose a range of records?" check. A uniformly sparse key
   * space (TPC-H-style gapped sequences, sharded generators) shows every
   * block in one tight band; a DROPPED RANGE shows as blocks falling
   * into a lower band than their neighbors — visible in the census even
   * when the total row count looks plausible. Fill = present ids over
   * the block's OBSERVED span (max−min+1), so the metric is
   * generator-agnostic.
   *
   * Scale shape: one block-keyed collapse (map-side partials) then a
   * ≤5-row band rollup. No windows, no joins, no sort.
   */
  def idContinuityCensus(df: DataFrame, keyCol: String,
      blockSize: Long = 1000L): DataFrame = {
    require(blockSize >= 2, s"blockSize $blockSize must be >= 2")
    val blocks = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("long").as("__k"))
      .distinct()
      .groupBy(expr(s"__k DIV $blockSize").as("__blk"))
      .agg(count(lit(1)).as("__present"),
        min(col("__k")).as("__lo"), max(col("__k")).as("__hi"))
      .withColumn("__fill",
        expr("__present * 1000000 DIV (__hi - __lo + 1)"))
    blocks
      .withColumn("band",
        when(col("__fill") <= 200000, "1_under_20pct")
          .when(col("__fill") <= 400000, "2_under_40pct")
          .when(col("__fill") <= 600000, "3_under_60pct")
          .when(col("__fill") <= 800000, "4_under_80pct")
          .otherwise("5_over_80pct"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("__present")).as("ids_present"),
        min(col("__fill")).as("min_fill_ppm"),
        max(col("__fill")).as("max_fill_ppm"))
      .orderBy("band")
  }

  /**
   * CHILD-NUMBERING audit — do a parent's child sequence numbers form
   * the dense run 1..n? Violations split by KIND, because each kind has
   * a different root cause: `dup_seq` (same number twice — a retried
   * write), `gap` (max > count with distinct numbers — a lost child),
   * `bad_start` (min ≠ 1 — truncated head). The invariant every
   * order/lineitem, invoice/line, message/part schema promises and
   * nothing enforces.
   *
   * Scale shape: one parent-keyed collapse computing (count, distinct,
   * min, max) with map-side partials, then a ≤4-row kind rollup.
   */
  def childNumberingAudit(df: DataFrame, parentCol: String,
      seqCol: String): DataFrame = {
    val per = df.filter(col(parentCol).isNotNull && col(seqCol).isNotNull)
      .groupBy(col(parentCol))
      .agg(count(lit(1)).as("__n"),
        countDistinct(col(seqCol)).as("__nd"),
        min(col(seqCol).cast("long")).as("__mn"),
        max(col(seqCol).cast("long")).as("__mx"))
      .withColumn("kind",
        when(col("__nd") < col("__n"), "1_dup_seq")
          .when(col("__mn") =!= 1L, "2_bad_start")
          .when(col("__mx") =!= col("__n"), "3_gap")
          .otherwise("0_dense"))
    val tot = per.agg(count(lit(1)).as("__t"))
    per.groupBy("kind")
      .agg(count(lit(1)).as("n_parents"),
        sum(col("__n")).as("n_children"))
      .crossJoin(broadcast(tot))
      .select(col("kind"), col("n_parents"), col("n_children"),
        expr("n_parents * 1000000 DIV __t").as("share_ppm"))
      .orderBy("kind")
  }

  /**
   * TIMESTAMP COLLISION census — how many events share each EXACT
   * timestamp, rolled up by collision size: the ingest-forensics read
   * that separates genuinely event-timed data (collisions ≈ birthday-
   * bound) from batch-stamped data (every row in a load shares the
   * writer's clock) and from truncated precision (collisions step up
   * exactly at the second/minute boundary). A timestamp column that
   * LOOKS event-time but is batch-stamped silently breaks every
   * watermark, session, and as-of join built on it — this census is the
   * two-aggregate check that catches it first.
   *
   * Scale shape: one ts-keyed collapse, one ≤64-row size rollup (size
   * bands are log2 — a million-row collision lands in band 20, not a
   * million output rows).
   */
  def timestampCollisionCensus(df: DataFrame, tsCol: String): DataFrame = {
    val per = df.filter(col(tsCol).isNotNull)
      .groupBy(col(tsCol)).agg(count(lit(1)).as("__n"))
    val tot = per.agg(sum(col("__n")).as("__rows"))
    per
      .withColumn("size_band", (length(bin(col("__n"))) - 1).cast("int"))
      .groupBy("size_band")
      .agg(count(lit(1)).as("n_timestamps"), sum(col("__n")).as("n_events"))
      .crossJoin(broadcast(tot))
      .select(col("size_band"),
        expr("shiftleft(1L, size_band)").as("band_lo"),
        col("n_timestamps"), col("n_events"),
        expr("n_events * 1000000 DIV __rows").as("event_share_ppm"))
      .orderBy("size_band")
  }

  /**
   * TEMPORAL-ORDER audit — child events dated BEFORE their parent
   * (lineitems shipping before the order was placed): per violation
   * severity band (same-day grace, <7 days, ≥7 days early), counts and
   * the worst lead observed. Impossible orderings are the strongest
   * signal of clock skew, timezone double-conversion, or key collisions
   * from a bad join — and they poison every as-of/causal analysis
   * silently unless counted first.
   *
   * Scale shape: one hash equi-join on the parent key, a map-side day
   * diff, a ≤4-row band rollup with a broadcast total.
   */
  def temporalOrderAudit(parent: DataFrame, parentKey: String,
      parentTs: String, child: DataFrame, childKey: String,
      childTs: String): DataFrame = {
    val joined = child
      .filter(col(childKey).isNotNull && col(childTs).isNotNull)
      .select(col(childKey).as("__k"), to_date(col(childTs)).as("__ct"))
      .join(parent.filter(col(parentKey).isNotNull && col(parentTs).isNotNull)
        .select(col(parentKey).as("__k"), to_date(col(parentTs)).as("__pt")),
        "__k")
      .withColumn("__lead", datediff(col("__pt"), col("__ct")).cast("long"))
    val tot = joined.agg(count(lit(1)).as("__t"))
    joined
      .withColumn("band",
        when(col("__lead") <= 0, "0_ok")
          .when(col("__lead") < 7, "1_under_week_early")
          .otherwise("2_week_plus_early"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_children"), max(col("__lead")).as("worst_lead_days"))
      .crossJoin(broadcast(tot))
      .select(col("band"), col("n_children"), col("worst_lead_days"),
        expr("n_children * 1000000 DIV __t").as("share_ppm"))
      .orderBy("band")
  }

  def forgetImpact(keys: DataFrame, keyCol: String,
      tables: Seq[(String, DataFrame, String)]): DataFrame = {
    require(tables.nonEmpty, "forgetImpact needs at least one table")
    val forget = broadcast(keys.select(col(keyCol).as("__k")).distinct())
    tables.map { case (label, df, c) =>
      df.select(col(c).as("__k"))
        .join(forget, Seq("__k"), "left_semi")
        .agg(count(lit(1)).as("affected_rows"))
        .select(lit(label).as("entity"), col("affected_rows"))
    }.reduce(_ unionAll _)
  }
}
