package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTTP redirect-chain resolution — the crawl-curation step BEFORE
  * URL-keyed dedup: a page captured at `/old` that 301s through
  * `/moved` to `/final` must key as `/final`, or the corpus counts
  * the same page once per historical spelling.
  *
  * Resolution is POINTER JUMPING (the classic parallel
  * list-ranking move), not per-hop walking: each round replaces every
  * pointer with its pointer's pointer and accumulates hop counts, so
  * chains up to 2^rounds hops resolve in `rounds` self-joins —
  * O(log L) shuffles instead of O(L). Every round is one
  * co-partitioned hash self-join on the pointer key; the frame is
  * dim-sized (one row per redirect SOURCE, not per page), and each
  * round's result snapshots through an eager plan-truncating
  * checkpoint (the [[LinkRank]]/[[Dedup]] discipline — reliable
  * checkpoint dir when configured, executor-local otherwise), so
  * driver plan work is O(1) per round.
  *
  * Termination/cycles: a pointer that lands on a URL that is NOT
  * itself a redirect source is terminal. Redirect CYCLES (`a→b→a`,
  * self-redirects) never terminate — after `rounds` rounds they
  * surface with `terminal = false` and `hops = 2^rounds`
  * (deterministic, so the DuckDB oracle replays the same rounds
  * CTE-by-CTE), and a curation gate drops or flags them. A source
  * with multiple recorded targets (the same URL captured redirecting
  * to different places over time) collapses deterministically to the
  * bytewise-smallest target first — resolution needs a FUNCTION, and
  * min-target is stable across engines.
  */
object Redirects {

  /** Resolve each redirect source to its final destination.
    *
    * @param edges  DataFrame with string `src`, `dst` columns (one
    *               row per captured redirect; duplicates and
    *               conflicting targets collapse to min-dst)
    * @param rounds pointer-jumping rounds: chains up to 2^rounds hops
    *               resolve (real redirect chains are short — browsers
    *               cap around 20 hops, so the default 5 covers 32)
    * @param graphPartitions partition count for the resolution
    *               stages — the redirect table is dim-sized relative
    *               to the corpus; 0 keeps the session default
    * @return (src, final_dst, hops, terminal) — `terminal = false`
    *         marks a chain still unresolved after `rounds` (a cycle,
    *         or longer than 2^rounds)
    */
  def resolve(edges: DataFrame, rounds: Int = 5,
              graphPartitions: Int = 0): DataFrame = {
    require(rounds >= 0 && rounds <= 20, s"rounds out of range: $rounds")
    val sess = edges.sparkSession
    val gp =
      if (graphPartitions > 0) graphPartitions
      else sess.sessionState.conf.numShufflePartitions
    // superseded round files under a RELIABLE checkpoint dir are only
    // auto-deleted with spark.cleaner.referenceTracking.cleanCheckpoints
    // =true (default false — the graft entry mains set it); local
    // checkpoint blocks are reclaimed by the ContextCleaner regardless.
    // Local checkpoints are LAZY: each round's frame is a plan-leaf
    // LogicalRDD either way (the driver-side O(1)-per-round guarantee),
    // but nothing needs the data until the caller's action — which then
    // runs ALL rounds as one job, caching each round's blocks en route
    // (both self-join sides of round r+1 read round r's cached blocks),
    // instead of one eager materialization job per round. Reliable
    // checkpoints stay eager: their lazy form re-runs the plan to write
    // the checkpoint files.
    val snap: DataFrame => DataFrame =
      if (sess.sparkContext.getCheckpointDir.isDefined) _.checkpoint(true)
      else _.localCheckpoint(false)
    // one row per redirect source: deterministic min-dst collapse via
    // a partial-agg'd hash shuffle, pre-partitioned on src (ptr
    // lookups join against THIS key every round). Null-keyed rows drop
    // FIRST: a source whose only recorded dst is null would otherwise
    // carry ptr=null through every round, never join, and report
    // terminal=true with final_dst=null — a silently "resolved" row a
    // downstream rewrite join would drop or mis-key.
    var cur = snap(edges
      .select(col("src").cast("string").as("src"), col("dst").cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .repartition(gp, col("src"))
      .groupBy("src").agg(min(col("dst")).as("ptr"))
      .select(col("src"), col("ptr"), lit(1L).as("hops")))
    for (_ <- 0 until rounds) {
      // ptr' = ptr(ptr) when the pointer is itself a redirect source;
      // hops accumulate the ORIGINAL edge count traversed
      val hop = cur.select(col("src").as("j_src"), col("ptr").as("j_ptr"),
        col("hops").as("j_hops"))
      cur = snap(cur.join(hop, cur("ptr") === hop("j_src"), "left")
        .select(col("src"),
          coalesce(col("j_ptr"), col("ptr")).as("ptr"),
          (col("hops") + coalesce(col("j_hops"), lit(0L))).as("hops")))
    }
    // The terminal join reads `cur` TWICE (probe side + the t_src
    // build side) on concurrent threads — materialize the lazy leaf
    // ONCE here so neither consumer re-runs the round chain (the
    // multi-consumer rule from Dedup.ivfAssignedWithCc: lazy snapshots
    // are for strictly sequential single-consumer rounds).
    if (sess.sparkContext.getCheckpointDir.isEmpty) cur.foreach(_ => ())
    // terminal ⇔ the final pointer is not a redirect source
    val srcs = cur.select(col("src").as("t_src"))
    cur.join(srcs, cur("ptr") === srcs("t_src"), "left")
      .select(col("src"), col("ptr").as("final_dst"), col("hops"),
        col("t_src").isNull.as("terminal"))
  }

  /** INCREMENTAL maintenance of a resolution map: archives arrive in
    * batches, and re-running [[resolve]] over the full edge history
    * re-reads and re-collapses every raw capture ever seen. This
    * variant resolves only the DELTA: the old map's terminal rows ride
    * along as already-COMPRESSED pointers (one jump spans the whole
    * old chain), so the round count covers new SEGMENTS, not total
    * hops, and the old raw edge corpus is never touched.
    *
    * Semantics vs a full recompute over old ∪ new (spec-pinned):
    *   - new chains, extensions of old chains, and old terminals that
    *     a new edge turns into mid-chain pointers (old `final_dst`
    *     becomes a new source) match the full recompute EXACTLY,
    *     hops included;
    *   - old CYCLE rows (`terminal = false`) pass through verbatim —
    *     their pointers are mid-rotation artifacts, not resolutions,
    *     so re-jumping them would only change the noise;
    *   - a new chain that feeds an old cycle surfaces
    *     `terminal = false` with hops counting its NEW segment only
    *     (hops into a cycle are unbounded anyway);
    *   - a new edge whose source was ALREADY resolved is IGNORED (the
    *     old capture wins): min-dst collapse across batches would
    *     need the old raw edges back — re-captured sources require a
    *     rebuild of those keys, which is the full [[resolve]].
    *
    * @param newEdges newly captured (src, dst) redirect edges;
    *                 sources should be previously-unseen URLs
    * @param resolved the prior [[resolve]]/[[resolveIncremental]]
    *                 output being maintained
    * @return the maintained map: old rows (extended where a new edge
    *         continues them) ∪ the delta's resolutions, same schema
    */
  def resolveIncremental(newEdges: DataFrame, resolved: DataFrame,
                         rounds: Int = 5, graphPartitions: Int = 0): DataFrame = {
    require(rounds >= 0 && rounds <= 20, s"rounds out of range: $rounds")
    val sess = newEdges.sparkSession
    val gp =
      if (graphPartitions > 0) graphPartitions
      else sess.sessionState.conf.numShufflePartitions
    // lazy local checkpoints — see [[resolve]]'s note
    val snap: DataFrame => DataFrame =
      if (sess.sparkContext.getCheckpointDir.isDefined) _.checkpoint(true)
      else _.localCheckpoint(false)
    val oldTerm = resolved.where(col("terminal"))
    val oldCyc = snap(resolved.where(!col("terminal"))
      .select(col("src"), col("final_dst"), col("hops"), col("terminal")))
    // the delta's min-dst collapse, minus re-captured sources
    val fresh = newEdges
      .select(col("src").cast("string").as("src"), col("dst").cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .join(resolved.select(col("src")), Seq("src"), "left_anti")
      .repartition(gp, col("src"))
      .groupBy("src").agg(min(col("dst")).as("ptr"))
      .select(col("src"), col("ptr"), lit(1L).as("hops"))
    // jump frame: fresh pointers ∪ the old map compressed to one jump
    // each (old rows only move if their final lands on a NEW source —
    // the extension case); cycles stay out (pass through verbatim)
    var cur = snap(fresh
      .unionByName(oldTerm.select(col("src"), col("final_dst").as("ptr"), col("hops")))
      .repartition(gp, col("src")))
    for (_ <- 0 until rounds) {
      val hop = cur.select(col("src").as("j_src"), col("ptr").as("j_ptr"),
        col("hops").as("j_hops"))
      cur = snap(cur.join(hop, cur("ptr") === hop("j_src"), "left")
        .select(col("src"),
          coalesce(col("j_ptr"), col("ptr")).as("ptr"),
          (col("hops") + coalesce(col("j_hops"), lit(0L))).as("hops")))
    }
    // materialize the double-consumed leaves once — see resolve()'s note
    // (`cur` feeds probe + t_src sides; `oldCyc` feeds t_src + the final
    // union)
    if (sess.sparkContext.getCheckpointDir.isEmpty) {
      cur.foreach(_ => ())
      oldCyc.foreach(_ => ())
    }
    // terminal ⇔ the final pointer is not a redirect source anywhere —
    // jumped rows AND the cycle members that never joined the frame
    val srcs = cur.select(col("src").as("t_src"))
      .unionByName(oldCyc.select(col("src").as("t_src")))
    cur.join(srcs, cur("ptr") === srcs("t_src"), "left")
      .select(col("src"), col("ptr").as("final_dst"), col("hops"),
        col("t_src").isNull.as("terminal"))
      .unionByName(oldCyc)
  }

  /** APPLY a resolution map to the corpus: re-key every page captured
    * at a redirected URL under its chain's FINAL destination — the
    * step [[resolve]] exists for. Run this BEFORE URL-keyed dedup so
    * `/old`, `/moved` and `/final` captures of one page collapse to
    * one key instead of counting once per historical spelling.
    *
    * Keying rules (each bound by `dd_url_dedup_redirect`):
    *   - a page whose URL is a TERMINAL redirect source keys under
    *     `final_dst` (`redirect_hops` carries the chain length);
    *   - a CYCLE member (`terminal = false`) keeps its OWN key —
    *     a cycle names no destination, so collapsing its members
    *     under a rotated pointer would merge pages that are not the
    *     same document (`redirect_hops` stays 0, like unredirected);
    *   - a URL that is no redirect source at all keeps its own key.
    *
    * Scale shape: the resolution map is DIM-sized (one row per
    * redirect source — 10⁶-10⁸ rows for a 10¹¹-page corpus), so it
    * BROADCASTS and the page side never shuffles: one map-only pass
    * over the corpus, the `ta_link_rank_apply` discipline. For a
    * resolution map past broadcast range, drop the `broadcast` hint
    * and let AQE pick the join — the page side then hash-shuffles
    * once on the URL key, which the downstream URL dedup needed
    * anyway.
    *
    * @param pages      corpus frame; `urlCol` must be CANONICALIZED
    *                   with the same kernel that built the edge URLs
    *                   (graft_canon_url) or keys miss bytewise
    * @param resolution [[resolve]] output (src, final_dst, hops,
    *                   terminal)
    * @param urlCol     page key column name
    * @return `pages` plus `url_final` (the dedup key) and
    *         `redirect_hops` (0 when not re-keyed)
    */
  def applyResolution(pages: DataFrame, resolution: DataFrame,
                      urlCol: String = "url_canon"): DataFrame = {
    val dim = broadcast(resolution
      .where(col("terminal") && col("final_dst").isNotNull)
      .select(col("src").as("__r_src"), col("final_dst").as("__r_dst"),
        col("hops").as("__r_hops")))
    pages.join(dim, pages(urlCol) === dim("__r_src"), "left")
      .withColumn("url_final", coalesce(col("__r_dst"), col(urlCol)))
      .withColumn("redirect_hops", coalesce(col("__r_hops"), lit(0L)))
      .drop("__r_src", "__r_dst", "__r_hops")
  }
}
