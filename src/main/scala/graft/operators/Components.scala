package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed connected components over an undirected edge list — the
 * grouping step that turns pairwise near-duplicate edges (minhash /
 * simhash / embedding pairs) into whole duplicate CLUSTERS, so one
 * representative per cluster survives even when A~B and B~C but A and C
 * never produced a candidate pair. Pair-at-a-time dedup misses exactly
 * those transitive chains; clustering is how production pipelines close
 * them.
 *
 * Algorithm: iterated min-label propagation fused with pointer jumping.
 * Each round every node takes the minimum label over {itself} ∪
 * neighbours (one join with the symmetric edge list), then jumps:
 * label ← label(label) (one self-join). The jump doubles the distance a
 * minimum travels per round, so convergence is O(log diameter) rounds,
 * not O(diameter) — the difference between ~8 and ~250 rounds on a
 * 250-node chain. Labels only decrease and only take node-id values from
 * the same component, so the fixpoint assigns every node its component's
 * minimum id.
 *
 * Scale notes: each round is two hash joins on the node id plus one
 * `count` action for the convergence check. Each round's labels are
 * materialized through a flat `LogicalRDD` plan + `persist`, and the
 * superseded round is explicitly unpersisted. Both halves matter:
 * plain persist alone leaves the logical plan of round k referencing
 * round k-1's plan several times, so the plan TREE grows ~4^k and
 * Spark OOMs just STRINGIFYING it around round 6; `localCheckpoint`
 * flattens the plan but its storage cannot be released mid-loop, so
 * 20 rounds would hold O(rounds × |V|) label generations in executor
 * storage instead of two. On a real cluster a reliable checkpoint
 * (HDFS/S3) every few rounds additionally caps the RDD lineage a lost
 * executor replays — every iterative operator here takes an optional
 * `checkpointDir` that writes one durable label/edge generation every
 * `checkpointInterval` rounds (default off: single-JVM local mode
 * replays from the persisted parent in one step anyway, so durable
 * files would only add I/O). Nodes appear only if they occur in an edge —
 * callers union isolated rows back as their own singleton components
 * (see the `dedup_groups_cc` query).
 */
object Components {

  /** THE checkpoint cadence, shared by every iterative operator here —
    * one rule, so the label-prop/stars/pageRank loops cannot drift:
    * with a `checkpointDir`, rounds `CheckpointInterval-1,
    * 2·CheckpointInterval-1, …` (0-based) land as reliable
    * `Dataset.checkpoint()` generations. Each new generation supersedes
    * the previous one — its files root no live lineage once the next
    * eager checkpoint has materialized (intermediate persisted rounds
    * are released by the loops and never re-read) — so the superseded
    * generation is deleted on the spot: durable storage holds at most
    * TWO generations during a run and ONE after, instead of growing by
    * O(rounds / interval) per call for the life of the session. The
    * final generation must outlive the call (the returned plan's
    * lineage roots there); the caller owns `checkpointDir` end-of-life.
    *
    * Caveat, documented not hidden: Spark's checkpoint location is
    * SparkContext-GLOBAL. Concurrent iterative calls in one JVM should
    * pass the SAME dir (each `setCheckpointDir` adds a UUID subdir, so
    * same-dir calls never collide); passing different dirs concurrently
    * redirects where later generations land — still durable and
    * replayable, just not under the dir that caller named. */
  private final class CheckpointCadence(
      spark: org.apache.spark.sql.SparkSession,
      checkpointDir: Option[String]) {
    checkpointDir.foreach { d =>
      Components.synchronized {
        if (!spark.sparkContext.getCheckpointDir.exists(_.contains(d)))
          spark.sparkContext.setCheckpointDir(d)
      }
    }
    private var superseded: Option[String] = None
    /** `Some(durable df)` when `iter` is a checkpoint round, else None. */
    def maybeCheckpoint(df: DataFrame, iter: Int): Option[DataFrame] =
      if (checkpointDir.isDefined && (iter + 1) % CheckpointInterval == 0) {
        val cp = df.checkpoint() // eager: computes, writes, truncates lineage
        superseded.foreach { p =>
          val path = new org.apache.hadoop.fs.Path(p)
          path.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(path, /* recursive = */ true)
        }
        superseded = org.apache.spark.sql.graftbridge.CatalystBridge.checkpointFileOf(cp)
        Some(cp)
      } else None
  }

  /** Shared per-round materializer: flat-plan persist by default; on a
    * `checkpointDir` round, a RELIABLE checkpoint instead (the HDFS/S3
    * story the flat-plan persist alone does not give a real cluster).
    * Returns a handle whose `unpersist()` stays the correct release
    * call either way (a no-op for a checkpointed generation). */
  private def roundMaterializer(
      spark: org.apache.spark.sql.SparkSession,
      checkpointDir: Option[String]): (DataFrame, Int) => DataFrame = {
    val cadence = new CheckpointCadence(spark, checkpointDir)
    (df: DataFrame, roundsDone: Int) =>
      cadence.maybeCheckpoint(df, roundsDone).getOrElse(
        org.apache.spark.sql.graftbridge.CatalystBridge.flattenPlan(df).persist())
  }

  /** Rounds between durable checkpoints when a `checkpointDir` is given:
    * small enough to bound replay, large enough that checkpoint I/O
    * stays a fraction of the round joins. */
  val CheckpointInterval = 4

  /**
   * @param edges two-column DataFrame (`src`, `dst`) of undirected edges
   * @param checkpointDir reliable (HDFS/S3/DFS) checkpoint location; when
   *                      set, every [[CheckpointInterval]]-th round's
   *                      labels are durably checkpointed so executor loss
   *                      replays at most that many rounds
   * @return (`id`, `component`) — component = min node id reachable
   */
  def connectedComponents(
      edges: DataFrame,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxIter >= 1, s"maxIter must be positive: $maxIter")
    // flat-plan materialization: LogicalRDD severs the growing plan tree,
    // persist makes each round's labels reusable and RELEASABLE
    val roundMat = roundMaterializer(edges.sparkSession, checkpointDir)
    def materialize(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.CatalystBridge.flattenPlan(df).persist()
    // materialize the RAW edge list before symmetrizing: the symmetric
    // union references `edges` twice, so building sym straight off the
    // caller's DataFrame executes the whole upstream edge DAG (a window
    // — or an entire minhash banding pipeline for minhashDedupCc) once
    // PER UNION BRANCH; persisting the raw edges first makes the second
    // branch a cache read (BENCH_r07: minhashDedupCc paid the minhash
    // pipeline twice). sym is then persisted too — every round joins it
    // — and both release on exit. distinct() here: CC is invariant to
    // edge multiplicity, but LSH candidate streams emit one copy per
    // colliding band, and every duplicate would otherwise ride through
    // sym and all O(log d) rounds of joins — one 16-byte-row exchange
    // up front beats `bands`× heavier rounds.
    val e0 = materialize(edges.select(col("src"), col("dst")).distinct())
    // sym is PRE-PARTITIONED on nbr — the key every round's neighbour
    // join uses — and materialized through the partitioning-preserving
    // flatten (r20, guide §2.4): the per-round join then shuffles only
    // the label side; the (larger) edge list crosses an exchange once
    // per CALL instead of once per round.
    val sym = org.apache.spark.sql.graftbridge.CatalystBridge
      .flattenPlanKeepPartitioning(
        e0.select(col("src").as("id"), col("dst").as("nbr"))
          .union(e0.select(col("dst").as("id"), col("src").as("nbr")))
          .repartition(col("nbr")))
      .persist()
    // labelsM is the persisted handle (unpersist must target the exact
    // cached Dataset — calling it on a derived projection is a no-op);
    // labels is the (id, component) view the joins consume
    var labelsM = materialize(
      sym.select(col("id")).distinct()
        .withColumn("component", col("id")))
    var labels = labelsM
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min over self + neighbour labels; the pre-round label rides along
      // as __old so the convergence check needs no extra join later
      val nbrLabels = sym.join(
        labels.select(col("id").as("nbr"), col("component").as("__nc")), "nbr")
        .groupBy(col("id")).agg(min(col("__nc")).as("__nmin"))
      // lowered feeds BOTH sides of the pointer-jump self-join below —
      // unpersisted, Catalyst executed the whole lowering chain (the
      // sym⋈labels join + groupBy included) once per branch, doubling
      // every round (r20; the union-branch lesson at the top of this
      // method, applied to the round body). Persisted flat, released
      // right after the round's count materializes `next`.
      val lowered = materialize(labels.join(nbrLabels, Seq("id"), "left")
        .select(col("id"), col("component").as("__old"),
          least(col("component"), coalesce(col("__nmin"), col("component")))
            .as("component")))
      // pointer jump: component ← component(component). Every label is a
      // node id inside the same component, so the lookup always hits.
      val jump = lowered.select(col("id").as("__jid"), col("component").as("__jc"))
      val next = roundMat(
        lowered.join(jump, lowered("component") === jump("__jid"), "left")
          .select(lowered("id"), col("__old"),
            least(lowered("component"), coalesce(col("__jc"), lowered("component")))
              .as("component")), iter)
      // labels are monotone non-increasing: converged ⇔ nothing dropped
      // (counted off the just-materialized round — no further join; this
      // count is also what forces the round's persist)
      val changed = next.filter(col("component") < col("__old")).count()
      lowered.unpersist()
      // the first round's count is the action that materializes the
      // persisted sym; e0 (consumed only by sym's two union branches) is
      // dead weight from then on — release it instead of holding a full
      // distinct edge list in storage through all O(log d) rounds
      if (iter == 0) e0.unpersist()
      labelsM.unpersist()
      labelsM = next
      labels = next.select(col("id"), col("component"))
      converged = changed == 0
      iter += 1
    }
    sym.unpersist()
    // the final round's cache lives on inside the returned plan and a
    // caller's unpersist on the projection would be a no-op — register
    // it for scoped release instead of leaking one |V|-row cache per
    // invocation for the application lifetime
    graft.CacheScope.adopt(labelsM)
    labels
  }

  /**
   * Alternating large-star / small-star connected components — the
   * general-graph scale path (the two-phase algorithm of Kiveris,
   * Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
   * MapReduce and Beyond", ACM SoCC'14). [[connectedComponents]] keeps
   * the edge list FIXED and iterates labels over it, so a hub's whole
   * neighbourhood re-shuffles every round and the per-round cost never
   * shrinks. This algorithm rewrites the EDGE SET itself: large-star
   * re-hangs every neighbour larger than the center onto the
   * neighbourhood minimum, small-star re-hangs the smaller neighbours.
   * Each round monotonically flattens the graph toward a forest of stars
   * centered at component minima — hubs collapse, the shuffled bytes
   * shrink round over round, and at the fixpoint the edges ARE the
   * answer: (component-min, member). O(log² n) rounds worst case,
   * O(log n) observed; per round three hash shuffles (two groupBy-min,
   * one distinct), each over the current — shrinking — edge set.
   *
   * Prefer this over label propagation when the duplicate graph may hold
   * high-degree hubs (boilerplate docs that near-match thousands of
   * others); ComponentsSpec cross-checks the two on identical inputs.
   * Same output contract as [[connectedComponents]]: (`id`, `component`),
   * nodes appearing in at least one edge, component = min reachable id.
   */
  def connectedComponentsStars(
      edges: DataFrame,
      maxIter: Int = 30,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxIter >= 1, s"maxIter must be positive: $maxIter")
    val roundMat = roundMaterializer(edges.sparkSession, checkpointDir)
    def materialize(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.CatalystBridge.flattenPlan(df).persist()
    // cheap multiset fingerprint for the convergence check: the round is
    // a fixpoint iff the (distinct, canonical) edge set stopped changing
    // bit_xor (not sum): order-independent, collision-resistant enough
    // over distinct 64-bit hashes, and cannot overflow under ANSI mode
    def signature(ed: DataFrame): (Long, Long) = {
      val r = ed.agg(count(lit(1)), coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L)))
        .collect().head
      (r.getLong(0), r.getLong(1))
    }
    // Round shape (r20, guide §2.4 "remove shuffles outright"): each
    // star phase needs min-over-the-c-partition attached back to every
    // row of that partition — a groupBy-min + self-join on c shuffles
    // the edge set TWICE per phase; an unbounded window min over
    // `partition by c` attaches it in ONE exchange (+ a per-partition
    // sort, group size = node degree, spillable — the same skew bound
    // the aggregate had). smallStar's two output branches additionally
    // fused into one explode, so the round DAG (including largeStar's
    // window) executes once instead of once per union branch —
    // 5 exchanges/round → 3 (numbers in OPTIMIZATION_r20.md). Emitted
    // row multiset is IDENTICAL per phase (ComponentsSpec cross-checks
    // against label propagation).
    val byC = org.apache.spark.sql.expressions.Window.partitionBy("c")
    // large-star(c): hang every neighbour n > c onto m = min(Γ(c) ∪ {c}).
    // Each undirected edge is seen from both endpoints; only the smaller
    // center emits it, so the output stays one row per edge pre-distinct.
    // m ≤ c < n keeps the (u < v) canonical orientation for free.
    def largeStar(ed: DataFrame): DataFrame = {
      val sym = ed.select(col("u").as("c"), col("v").as("n"))
        .union(ed.select(col("v").as("c"), col("u").as("n")))
      // no distinct here: duplicate (m, n) rows (two centers sharing a
      // minimum and a neighbour) are degree-bounded and harmless to
      // small-star's min-aggregate; the round's ONE dedup happens at
      // small-star's closing distinct, saving a full shuffle per round
      sym.withColumn("m", least(min(col("n")).over(byC), col("c")))
        .filter(col("n") > col("c"))
        .select(col("m").as("u"), col("n").as("v"))
    }
    // small-star(c): neighbours smaller than c (plus c itself) all hang
    // onto their minimum. Directing every edge at its larger endpoint
    // makes Γ⁻(c) exactly the incoming list — no symmetric doubling.
    // Every row (c, n, m) emits (m, c), plus (m, n) when n ≠ m — the
    // exact multiset of the former filter∪project pair, in one pass.
    def smallStar(ed: DataFrame): DataFrame = {
      ed.select(col("v").as("c"), col("u").as("n")) // n < c
        .withColumn("m", min(col("n")).over(byC))
        .select(explode(when(col("n") =!= col("m"),
            array(struct(col("m").as("u"), col("n").as("v")),
              struct(col("m").as("u"), col("c").as("v"))))
          .otherwise(array(
            struct(col("m").as("u"), col("c").as("v"))))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .distinct()
    }
    // e0 holds the canonical distinct edges INCLUDING self-loops: the
    // star rewrite works on proper edges only, but a node whose only
    // edge is a self-loop is still "a node appearing in at least one
    // edge" per the output contract shared with connectedComponents —
    // dropping it here would silently shrink the returned node set.
    val e0 = materialize(
      edges.select(
        least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
        .distinct())
    var e = materialize(e0.filter(col("u") =!= col("v")))
    val selfLoops = materialize(
      e0.filter(col("u") === col("v")).select(col("u").as("id")).distinct())
    // force the tiny self-loop set now so e0 can release before the loop
    selfLoops.count()
    var sig = signature(e)
    e0.unpersist()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = roundMat(smallStar(largeStar(e)), iter)
      val nsig = signature(next)
      e.unpersist()
      e = next
      converged = nsig == sig
      sig = nsig
      iter += 1
    }
    // fixpoint edges are (component-min, member); minima label themselves
    val labels = e.select(col("v").as("id"), col("u").as("component"))
      .union(e.select(col("u").as("id"), col("u").as("component")))
      .distinct()
    // self-loop-only nodes are their own components; nodes with proper
    // edges are already labeled (anti-join keeps the sets disjoint)
    val extra = selfLoops
      .join(labels.select(col("id")), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))
    // final round's cache + the self-loop set outlive this call inside
    // the returned plan — register for scoped release (a caller's
    // unpersist on the derived projection would be a no-op)
    graft.CacheScope.adopt(e)
    graft.CacheScope.adopt(selfLoops)
    labels.union(extra)
  }

  /**
   * INCREMENTAL connected components: fold a batch of NEW edges into an
   * existing labeling without re-running CC over the historical edge
   * list — the daily-increment form of duplicate clustering (at 100 TB
   * the full near-dup graph is not something to re-traverse because one
   * day of documents arrived). The standing labeling is equivalent to a
   * forest of STARS (every node points at its component min), so the
   * history collapses to |V| star edges regardless of how many raw
   * near-dup pairs produced it, and the merge is CC over
   * (star edges ∪ new edges) — a graph whose historical part has
   * diameter 2, so label propagation converges in O(log new-diameter)
   * rounds dominated by the increment, not the corpus.
   *
   * Output contract matches [[connectedComponents]] except labels are
   * min over the UNION graph: nodes from the old labeling keep or lower
   * their component, never raise it; brand-new nodes appear with their
   * component. ComponentsSpec pins equality with a from-scratch CC over
   * (all old raw edges ∪ new edges) — the recompute the increment path
   * exists to avoid.
   *
   * @param labels existing (`id`, `component`) labeling
   * @param newEdges incremental (`src`, `dst`) near-dup pairs; may
   *                 reference old nodes, new nodes, or both
   */
  def incrementalCc(labels: DataFrame, newEdges: DataFrame, maxIter: Int = 20): DataFrame = {
    val starEdges = labels
      .filter(col("id") =!= col("component"))
      .select(col("component").as("src"), col("id").as("dst"))
    // singleton components (id = component, no star edge) must survive
    // the union-graph CC, which only returns nodes appearing in edges
    val all = connectedComponents(starEdges.union(newEdges), maxIter)
    val singletons = labels.select(col("id"), col("component"))
      .join(all.select(col("id")), Seq("id"), "left_anti")
    all.union(singletons)
  }

  /**
   * Fixed-point PageRank over an undirected edge list — the canonical-
   * document SCORER for duplicate clusters. [[connectedComponents]] says
   * which docs are interchangeable; PageRank on the same edge list says
   * which copy the most near-duplicate evidence points at, so "keep the
   * most central copy" can replace "keep the arbitrary min-id copy" as
   * the representative-selection rule (the center of a dup cluster is
   * typically the version the others were derived from).
   *
   * Arithmetic is fixed-point parts-per-billion LONGS with a FIXED
   * iteration count, not doubles to convergence: long sums commute, so
   * every round is order-independent exact integer arithmetic that an
   * unrolled SQL oracle replays bit-for-bit (a double contribution sum
   * would depend on partial-aggregation order and could never
   * hash-match). Damping 0.85 is the exact rational 17/20; every
   * division is a floor division (`DIV` here, `//` in the oracle).
   * Overflow: each score is ≤ the total mass 1e9, a node's contribution
   * sum is ≤ 1e9, and 17 × 1e9 ≪ 2⁶³.
   *
   * Per round: ONE hash join of the (degree-annotated, materialized-
   * once) symmetric edge list with the previous round's scores on the
   * 8-byte neighbour key, then one groupBy-sum on the node key — the
   * same shuffle shape as a label-propagation round. Rounds carry no
   * action: each is flattened ([[connectedComponents]]' plan-growth
   * rationale) and only the edge list and the final scores persist,
   * [[graft.CacheScope]]-scoped so the caller's first action computes
   * the chain exactly once.
   *
   * @param edges two-column DataFrame (`src`, `dst`), undirected
   * @param checkpointDir reliable checkpoint location; when set, every
   *                      [[CheckpointInterval]]-th round's scores are
   *                      durably checkpointed (eager — those rounds pay
   *                      one forced materialization, the price of
   *                      bounding a lost executor's replay depth)
   * @return (`id`, `pr`) — score in parts per billion, one row per
   *         node appearing in at least one edge
   */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 5,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"iterations must be in [1, 50]: $iterations")
    val cadence = new CheckpointCadence(edges.sparkSession, checkpointDir)
    def flat(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.CatalystBridge.flattenPlan(df)
    // persist the raw edges before the symmetric union + degree join:
    // symd's plan references sym twice and sym references edges twice,
    // so an unpersisted caller DAG would execute 4× on materialization
    // (connectedComponents' union-branch lesson, squared)
    val e0 = graft.CacheScope.scoped(flat(edges.select(col("src"), col("dst"))))
    val sym = e0
      .select(col("src").as("id"), col("dst").as("nbr"))
      .union(e0.select(col("dst").as("id"), col("src").as("nbr")))
    val deg = sym.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // neighbour degree rides on the edge so rounds pay ONE join, not two
    val symd = graft.CacheScope.scoped(flat(sym.join(
      deg.select(col("id").as("nbr"), col("deg").as("__nd")), "nbr")))
    val n = symd.select(col("id")).distinct().count()
    // that count materialized the persisted symd; e0 feeds only symd's
    // union branches, so release it now instead of holding the raw edge
    // list in storage through every rank round (scope release at the
    // caller would otherwise keep both alive for the whole query)
    e0.unpersist()
    require(n > 0, "pageRank needs at least one edge")
    val teleport = 150000000L / n // (1 − d)/n in ppb, floored
    var pr = symd.select(col("id")).distinct()
      .withColumn("pr", lit(1000000000L / n))
    var i = 0
    while (i < iterations) {
      // mass flowing over each edge = floor(pr(nbr) / deg(nbr)); every
      // node of the symmetric list has ≥ 1 neighbour, so the inner join
      // + groupBy covers the full node set
      val round = symd
        .join(pr.select(col("id").as("nbr"), col("pr").as("__np")), "nbr")
        .groupBy(col("id"))
        .agg(sum(expr("__np DIV __nd")).as("__s"))
        .select(col("id"),
          (lit(teleport) + expr("(17 * __s) DIV 20")).as("pr"))
      pr = cadence.maybeCheckpoint(round, i).getOrElse(flat(round))
      i += 1
    }
    graft.CacheScope.scoped(pr)
  }

  /**
   * Per-cluster diagnostics over a labeling and its edge list: node
   * count, edge count, and pair density `2·E / (N·(N−1))` — the "is this
   * duplicate cluster a tight clique or a hub-chained artifact?" triage
   * that decides whether a cluster's members are safe to collapse to one
   * survivor (density ≈ 1) or need pairwise re-verification (sparse
   * chains transitively glue non-duplicates). Density is one IEEE
   * multiply/divide over exact counts — hash-oracle-able; NULL for
   * singletons (no pairs to be dense over).
   *
   * Scale shape: one shuffle of the edge list on its src endpoint (8-byte
   * keys) to pick up component labels, then count aggregates on the
   * component key; the labeling is reused as-is. Output is one row per
   * cluster.
   */
  def componentStats(labels: DataFrame, edges: DataFrame): DataFrame = {
    val nodes = labels.groupBy(col("component")).agg(count(lit(1)).as("n_nodes"))
    val e = edges
      .join(labels.select(col("id").as("src"), col("component")), "src")
      .groupBy(col("component")).agg(count(lit(1)).as("__e"))
    nodes.join(e, Seq("component"), "left")
      .select(col("component"), col("n_nodes"),
        coalesce(col("__e"), lit(0L)).as("n_edges"))
      .withColumn("density",
        when(col("n_nodes") >= 2,
          (lit(2.0) * col("n_edges").cast("double")) /
            (col("n_nodes").cast("double") * (col("n_nodes") - 1).cast("double"))))
  }
}
