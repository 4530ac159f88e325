"""Connected components over near-duplicate pairs — the step that
turns pairwise dedup output into canonical document groups (keep one
representative per component, drop the rest).

Min-label propagation as DataFrame joins (the GraphX/GraphFrames
pattern without the dependency): every vertex starts labeled with its
own id; each iteration every vertex takes the min of its label and its
neighbors' labels; fixpoint = per-component minimum id.  The result is
the unique label fixpoint, so it is independent of iteration order and
partitioning — which is what makes an SQL oracle possible (transitive
closure via recursive CTE + min).

Scale design:

* one iteration = one equi-join (edges ⋈ labels) + one min-aggregation
  shuffle — no driver-side data beyond the converged/changed counter.
* iterations needed = component diameter; near-dup components are
  dense (near-cliques), so 2–4 rounds in practice.
* lineage is truncated each round per ``checkpoint_mode`` (local /
  reliable / none — see ``llmdata.checkpointing``; reliable is the
  100 TB choice under dynamic allocation) — without truncation the
  plan doubles per iteration and the job DAG, not the data, becomes
  the bottleneck.
* the changed-row count that drives convergence is the only action per
  round (Spark's iterative-algorithm idiom, same as MLlib).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from db_factfinder_spark.llmdata.checkpointing import materialize

# one-shot adamic_adar cap-semantics log marker (distinct from
# dedup._CAP_LOGGED so neither call-site suppresses the other's message)
_AA_CAP_LOGGED = False

# Default hub cap for wedge-through-the-middle joins (adamic_adar):
# fan-out per middle vertex is C(deg, 2), so one 10^5-degree hub alone
# emits 5×10^9 wedges at graph scale.  1,024 keeps every plausible
# common-neighbor signal (a shared 1,000-degree neighbor contributes
# the near-zero term 1/ln(1024)) while bounding any single middle's
# fan-out at ~5×10^5 wedges.
DEFAULT_MAX_DEGREE = 1024


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Vertex → component representative (the component's minimum id)
    for every vertex that appears in ``pairs``.  Isolated vertices are
    the caller's concern — a doc in no pair is its own group."""
    e = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = materialize(
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct(),
        checkpoint_mode,
    )
    labels = materialize(
        sym.select(F.col("a").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label")),
        checkpoint_mode,
    )
    for _ in range(max_iter):
        neighbor = sym.join(labels, sym["b"] == labels["id"]).select(
            sym["a"].alias("id"), F.col("label")
        )
        new = materialize(
            labels.unionByName(neighbor)
            .groupBy("id")
            .agg(F.min("label").alias("label")),
            checkpoint_mode,
        )
        changed = (
            new.join(
                labels.withColumnRenamed("label", "old_label"), "id"
            )
            .filter(F.col("label") < F.col("old_label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels


def neardup_groups(
    pairs: DataFrame, checkpoint_mode: str = "local"
) -> DataFrame:
    """Canonical near-dup groups from a pair list: ``(doc_id, rep_id,
    group_size)`` for every document in at least one pair; ``rep_id``
    is the component's minimum doc id (the survivor a dedup pass would
    keep)."""
    comp = connected_components(pairs, checkpoint_mode=checkpoint_mode)
    sizes = comp.groupBy("label").agg(F.count(F.lit(1)).alias("group_size"))
    return comp.join(sizes, "label").select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("rep_id"),
        "group_size",
    )


def select_survivors(scored: DataFrame, groups: DataFrame) -> DataFrame:
    """Survivor selection — the decision step between near-dup grouping
    and the filtered corpus: within each group keep the highest-quality
    member (ties broken by lowest id, which also canonicalizes exact
    duplicates, whose quality scores are identical).

    ``scored``: ``(doc_id, quality)`` for the whole corpus;
    ``groups``: ``(doc_id, rep_id, group_size)`` from
    ``neardup_groups`` — only documents in at least one pair appear, so
    ungrouped documents form singleton groups of themselves via the
    left join + coalesce.

    Scale: two shuffles (the group join on doc_id, the per-group
    window on group_id).  ``groups`` is proportional to the duplicated
    subset, not the corpus — but can still be huge, so it is NOT
    broadcast.

    Giant-group skew: with upstream hot-bucket caps disabled
    (``cap_hot_buckets(..., max_bucket=None)`` in the pair
    generators), a boilerplate flood can collapse millions of
    documents into ONE component, making one window partition huge.
    That is safe here — ``row_number`` over an ordered partition is
    sort-based and streaming (external sort, spillable; no per-group
    state), so the plan stays a single hash exchange on ``group_id``
    regardless of group size; the cost of the giant group is one
    task's sort, not memory.  The *upstream* mitigation is
    ``cap_hot_buckets`` itself: capping candidate buckets bounds how
    fast components can merge, which is the only true fix for a
    pathological universal-boilerplate corpus (tested with a
    10k-member group in test_llmdata)."""
    g = scored.join(groups, "doc_id", "left").select(
        "doc_id",
        "quality",
        F.coalesce("rep_id", F.col("doc_id")).alias("group_id"),
        F.coalesce("group_size", F.lit(1)).alias("group_size"),
    )
    w = Window.partitionBy("group_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return g.withColumn("keep", F.row_number().over(w) == 1).select(
        "doc_id", "group_id", "group_size", "quality", "keep"
    )


def triangle_counts(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Per-node triangle participation counts over an undirected edge
    list — the local clustering signal (dense near-dup cliques vs
    chains) the pair count alone can't see.

    Degree-ordered orientation: every edge points from its lower
    (degree, id) endpoint to the higher, turning the graph into a DAG
    where each triangle matches the wedge-close pattern exactly once
    AND every node's out-degree is O(√|E|) — the classic bound that
    keeps the wedge join's intermediate size at O(|E|^{3/2})
    regardless of skew (a star node of degree d would otherwise
    produce d² wedges).  Three self-equi-joins, no pairwise scan.
    """
    # canonicalize BEFORE distinct: an undirected edge arriving in both
    # orientations ((u,v) and (v,u)) must collapse to one row — kept
    # separate, both orient onto the same src/dst edge and every
    # triangle wedge-matches 2³ times; self-loops can't be in a triangle
    e = (
        pairs.select(
            F.least(F.col(id_a), F.col(id_b)).alias("a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionAll(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    keyed = (
        e.join(deg.withColumnsRenamed({"n": "a", "deg": "da"}), "a")
        .join(deg.withColumnsRenamed({"n": "b", "deg": "db"}), "b")
    )
    fwd = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    # materialized once: the three self-join aliases would otherwise
    # re-derive the whole upstream (pair generation + distinct + degree
    # joins) per branch — measured 30 re-planned leaves at sf0.001
    o = materialize(
        keyed.select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
        ),
        "local",
    )
    e1, e2, e3 = o.alias("e1"), o.alias("e2"), o.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.src"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("x"),
            F.col("e1.dst").alias("y"),
            F.col("e2.dst").alias("z"),
        )
    )
    return (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def two_hop_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Distinct ≤2-hop reach per vertex over an undirected edge list
    (input rows are unordered pairs; both orientations are derived
    here).  Classic semi-naive expansion: reach₂ = E ∪ (E ⋈ E on the
    middle vertex), minus self-loops, then count-distinct per source.

    Two shuffles: the E⋈E equi-join on the middle vertex and the
    count-distinct.  At scale the join fan-out is Σ deg(v)² — the
    hub-vertex hazard every 2-hop/triangle job has; the mitigation is
    the same degree-capping used by ``triangle_counts`` (cap or
    sample hub adjacency before expansion).  NULL endpoints are
    dropped (an edge to nothing is not an edge)."""
    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    hop2 = (
        sym.alias("x")
        .join(sym.alias("y"), F.col("x.b") == F.col("y.a"))
        .select(F.col("x.a").alias("a"), F.col("y.b").alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    reach = sym.union(hop2)
    return reach.groupBy(F.col("a").alias(src)).agg(
        F.count_distinct("b").alias("n_reach")
    )


def integer_pagerank(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    scale: int = 1_000_000_000_000,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Fixed-iteration PageRank in INTEGER fixed-point: ranks carry
    ``scale`` units, per-edge contribution is ``p // deg`` and the
    damping step is ``0.15·scale + (85·Σ)//100`` — every operation an
    exact int64, so the result is bit-identical on any engine, any
    partitioning, any iteration order (float PageRank sums are
    order-dependent; this is the oracle-able formulation, same trick
    as the decimal-exact k-means update).

    Per iteration: one broadcast-size degree join + one groupBy(dst)
    shuffle — the standard distributed PR step; lineage is truncated
    per ``checkpoint_mode``.  Input is an undirected pair list (both
    orientations derived); dangling nodes don't occur (every vertex
    here has degree ≥ 1 by construction).  max p ≈ scale·|V| keeps
    int64 safe for |V| < 9·10⁶ at the default scale; lower ``scale``
    for larger graphs."""
    from db_factfinder_spark.llmdata.checkpointing import materialize

    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    sym = materialize(
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct(),
        checkpoint_mode,
    )
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    p = deg.select("a", F.lit(scale).cast("long").alias("p"))
    base = (15 * scale) // 100
    for _ in range(iters):
        # integer DIV, not float '/': at deg > ~8k a double quotient
        # can round up across an integer and floor() lands one high
        contrib = p.join(deg, "a").select(
            "a", F.expr("p DIV deg").alias("c")
        )
        incoming = (
            sym.join(contrib, "a")
            .groupBy(F.col("b").alias("a"))
            .agg(F.sum("c").alias("s"))
        )
        p = materialize(
            incoming.select(
                "a",
                (
                    F.lit(base).cast("long") + F.expr("(85 * s) DIV 100")
                ).alias("p"),
            ),
            checkpoint_mode,
        )
    return p.select(F.col("a").alias("node"), "p")


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Connected components by alternating large-star / small-star
    rounds (Kiveris et al., SoCC 2014 — "Connected Components in
    MapReduce and Beyond"), the algorithm built for the graphs that
    break plain label propagation: high-diameter chains.

    One round = a LARGE-STAR pass (every strictly-larger neighbor of
    u reconnects to u's closed-neighborhood minimum m(u)) then a
    SMALL-STAR pass (every not-larger neighbor, and u itself,
    reconnects to m(u)).  Each pass is one groupBy-min + one
    equi-join — the same shuffle cost as a propagation round — but
    the alternation contracts path length GEOMETRICALLY: O(log² n)
    rounds on any graph versus O(diameter) for propagation (a 10⁶
    chain: tens of star rounds vs 10⁶ propagation rounds).  Near-dup
    graphs are dense near-cliques and favor propagation's simplicity;
    provenance/citation chains at 100 TB need this.

    The fixpoint — every component a star centered at its minimum —
    is the same unique object min-label propagation converges to, so
    the two implementations are interchangeable and oracle-checked
    against the same recursive-CTE closure.

    Output: ``id, label`` (component minimum), one row per vertex
    appearing in ``pairs``.
    """

    def symmetric(e: DataFrame) -> DataFrame:
        return (
            e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def closed_min(e: DataFrame) -> DataFrame:
        # m(u) = min({u} ∪ N(u))
        return (
            e.select("u", F.col("v").alias("w"))
            .union(e.select("u", F.col("u").alias("w")))
            .groupBy("u")
            .agg(F.min("w").alias("m"))
        )

    e0 = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = materialize(symmetric(e0), checkpoint_mode)
    vertices = materialize(
        edges.select(F.col("u").alias("id")).distinct(), checkpoint_mode
    )
    for _ in range(max_iter):
        # large-star: each undirected edge {x, y}, x < y, rewires its
        # upper endpoint to m(lower)
        m1 = closed_min(edges)
        ls = (
            edges.join(m1, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        mid = materialize(symmetric(ls), checkpoint_mode)
        # small-star: lower endpoints (and u itself) rewire to m(u)
        m2 = closed_min(mid)
        ss = (
            mid.join(m2, "u")
            .filter(F.col("v") <= F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m2.select(F.col("u").alias("u"), F.col("m").alias("v")))
        )
        new_edges = materialize(symmetric(ss), checkpoint_mode)
        # converged ⇔ the UNDIRECTED edge set is unchanged (both
        # anti-joins — contraction can shrink the set, which a
        # one-sided "no new edges" probe would mistake for a fixpoint)
        unchanged = (
            new_edges.join(edges, ["u", "v"], "left_anti").limit(1).count()
            == 0
            and edges.join(new_edges, ["u", "v"], "left_anti")
            .limit(1)
            .count()
            == 0
        )
        edges = new_edges
        if unchanged:
            break
    # fixpoint stars: every non-minimum vertex has its minimum as a
    # neighbor; minima label themselves
    labels = edges.groupBy("u").agg(F.min("v").alias("label"))
    return (
        vertices.join(labels, vertices["id"] == labels["u"], "left")
        .select(
            "id",
            F.least(
                F.coalesce(F.col("label"), F.col("id")), F.col("id")
            ).alias("label"),
        )
    )


def incremental_components(
    base_labels: DataFrame,
    new_edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_col: str = "id",
    label_col: str = "label",
    max_iter: int = 20,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Incremental connected-component maintenance: given the
    persisted ``(id, label)`` assignment of an already-clustered
    graph (labels = component-minimum ids, what
    ``connected_components`` emits) and a batch of NEW edges, produce
    the assignment of the UNION graph without re-running components
    over the old edge set — the q178/q202 persisted-state discipline
    applied to the dedup graph (at 100 TB the edge log is the biggest
    thing in the lake; nightly ingest must not re-traverse it).

    Correctness rests on the contraction identity: every old
    component behaves as a single super-node named by its
    representative, so running components over the CONTRACTED new
    edges (endpoints mapped through the old labels, self-loops
    dropped) yields exactly the merges the batch causes — and because
    each old representative IS its component's minimum id, the min
    over merged representatives equals the min over all member ids,
    i.e. the labels match a from-scratch recompute bit-for-bit
    (property-tested over random splits).

    Cost: two broadcast-joinable lookups of the (small) batch
    endpoints against the label table, then components over a graph
    no larger than the BATCH — old edges are never read.

    Output: ``id, label`` for every node in the base ∪ batch.
    """
    e = new_edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    la = base_labels.select(
        F.col(id_col).alias("a"), F.col(label_col).alias("__la")
    )
    lb = base_labels.select(
        F.col(id_col).alias("b"), F.col(label_col).alias("__lb")
    )
    contracted = (
        e.join(la, "a", "left")
        .join(lb, "b", "left")
        .select(
            F.coalesce("__la", F.col("a")).alias("ra"),
            F.coalesce("__lb", F.col("b")).alias("rb"),
        )
        .filter(F.col("ra") != F.col("rb"))
    )
    delta = connected_components(
        contracted, "ra", "rb", max_iter=max_iter,
        checkpoint_mode=checkpoint_mode,
    ).select(F.col("id").alias("__rep"), F.col("label").alias("__new"))
    remapped_base = (
        base_labels.select(id_col, label_col)
        .join(
            delta, F.col(label_col) == F.col("__rep"), "left"
        )
        .select(
            F.col(id_col).alias("id"),
            F.coalesce("__new", F.col(label_col)).alias("label"),
        )
    )
    batch_nodes = (
        e.select(F.col("a").alias("id"))
        .unionByName(e.select(F.col("b").alias("id")))
        .distinct()
        .join(
            base_labels.select(F.col(id_col).alias("id")),
            "id",
            "left_anti",
        )
    )
    new_nodes = batch_nodes.join(
        delta, batch_nodes["id"] == delta["__rep"], "left"
    ).select(
        batch_nodes["id"],
        F.coalesce("__new", batch_nodes["id"]).alias("label"),
    )
    return remapped_base.unionByName(new_nodes)


def kcore_prune(
    edges: DataFrame,
    k: int,
    rounds: int = 4,
    src: str = "id_a",
    dst: str = "id_b",
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` passes of "drop every node
    with degree < k, then drop edges touching dropped nodes" — the
    standard dense-subgraph extractor (Seidman 1983; at corpus scale:
    isolate boilerplate/template cliques the near-dup graph surfaces,
    or spam rings in interaction graphs).

    After R rounds the survivor set is a (certified) SUPERSET of the
    true k-core that equals it once a round removes nothing; callers
    pick R by graph diameter or iterate on the ``converged`` readout.
    Exact k-core is an inherently iterative fixpoint (its depth can
    be Θ(n) on a path graph) — a bounded-round operator with an
    explicit convergence flag is the honest distributed contract, the
    same shape as ``connected_components``' diameter-bounded rounds.

    Each round is two keyed shuffles (degree groupBy + semi-join back
    to edges) over a frame that only SHRINKS; intermediate frames are
    materialized per ``checkpoint_mode`` to cut lineage growth, the
    connected-components discipline.

    Output: one row per surviving node — ``node, degree`` (degree
    within the surviving subgraph) — plus ``converged`` (boolean:
    did the last round change nothing).
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    und = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).filter(F.col("a") != F.col("b"))
    # undirected degree: count each edge from both endpoints
    e = materialize(
        und.unionByName(
            und.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct(),
        checkpoint_mode,
    )
    converged = False
    # one count per round: the previous round's pruned count IS this
    # round's input count — recounting e doubled the count jobs
    n_prev = e.count()
    for _ in range(rounds):
        deg = e.groupBy("a").agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("a")
        pruned = materialize(
            e.join(keep, "a")
            .join(keep.select(F.col("a").alias("b")), "b")
            .select("a", "b"),
            checkpoint_mode,
        )
        n_new = pruned.count()
        e = pruned
        if n_new == n_prev:
            converged = True
            break
        n_prev = n_new
    return (
        e.groupBy("a")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(
            F.col("a").alias("node"),
            "degree",
            F.lit(converged).alias("converged"),
        )
    )


def bipartite_label_propagation(
    edges: DataFrame,
    seeds: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    label_col: str = "label",
) -> DataFrame:
    """Two-round majority label propagation over a bipartite graph.

    Semi-supervised labeling, the workhorse behind spam/quality label
    expansion over user–item or doc–domain graphs: a handful of
    ``seeds`` (``u, label``) vote their label onto every right-side
    node they touch, then right-side labels vote back onto *unlabeled*
    left nodes.  Majority = highest exact int64 vote count, ties broken
    by ascending label (then nothing else is needed — counts and labels
    fully determine the winner), so the result is partition-invariant
    without any float scoring.

    Returns ``u, label, votes, n_labeled_neighbors`` for left nodes
    that were NOT seeds but received at least one vote: ``votes`` is
    the winning label's count, ``n_labeled_neighbors`` the number of
    distinct right-side neighbors that carried any label.

    Scale shape: two keyed groupBys and two equi-joins — no iteration
    state beyond the (node, label) vote frame, which is at most
    |edges| rows before the majority prune.  Deeper propagation =
    calling this again with the output unioned into the seeds
    (label tables stay one row per node, so state never grows past
    the node set).
    """
    e = edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
    s = seeds.select(
        F.col(u_col).alias("u"), F.col(label_col).alias("label")
    )
    # Round 1: each right node takes the majority label of its seeded
    # left neighbors (vote = number of distinct seeded neighbors with
    # that label — distinct, so a multi-edge pair can't double-vote).
    v_votes = (
        e.join(s, "u")
        .groupBy("v", "label")
        .agg(F.count_distinct("u").alias("votes"))
    )
    w_v = Window.partitionBy("v").orderBy(
        F.desc("votes"), F.asc("label")
    )
    v_labels = (
        v_votes.withColumn("rk", F.row_number().over(w_v))
        .filter(F.col("rk") == 1)
        .select("v", "label")
    )
    # Round 2: unlabeled left nodes (anti-join against the seed set)
    # take the majority over their right neighbors' round-1 labels.
    u_votes = (
        e.join(s, "u", "left_anti")
        .join(v_labels, "v")
        .groupBy("u", "label")
        .agg(F.count_distinct("v").alias("votes"))
    )
    w_u = Window.partitionBy("u").orderBy(
        F.desc("votes"), F.asc("label")
    )
    reach = (
        e.join(s, "u", "left_anti")
        .join(v_labels.select("v"), "v")
        .groupBy("u")
        .agg(F.count_distinct("v").alias("n_labeled_neighbors"))
    )
    return (
        u_votes.withColumn("rk", F.row_number().over(w_u))
        .filter(F.col("rk") == 1)
        .select("u", "label", "votes")
        .join(reach, "u")
    )


def hits_scores(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
) -> DataFrame:
    """HITS hubs/authorities (Kleinberg 1999) in exact integers.

    The usual formulation L2-normalizes each round — a float global
    reduction whose value depends on summation order.  Rankings are
    invariant to the positive normalizer, so this drops it entirely:
    hub/authority scores stay exact int64 sums (``a ← Σ h(in)``,
    ``h ← Σ a(out)``, both from ``h = 1``), making every rank
    partition-invariant and oracle-checkable bit-for-bit.  With int64
    and k iterations the scores are bounded by (max degree)^(2k) —
    callers keep ``iterations`` small (the classic "few rounds on the
    focused subgraph" usage), which is also the scale story: each
    round is two keyed aggregate+join shuffles, no driver state.

    Returns ``node, authority, hub`` for every node that appears on
    either side (missing side scores 0).  ``iterations`` must be ≥ 1.
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    hub = e.select(F.col("s").alias("n")).distinct().withColumn(
        "h", F.lit(1).cast("long")
    )
    auth = None
    for _ in range(iterations):
        auth = (
            e.join(hub, e["s"] == hub["n"])
            .groupBy("d")
            .agg(F.sum("h").alias("a"))
        )
        hub = (
            e.join(auth, e["d"] == auth["d"])
            .groupBy("s")
            .agg(F.sum("a").alias("h"))
            .select(F.col("s").alias("n"), "h")
        )
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select("d"))
        .distinct()
    )
    return (
        nodes.join(
            auth.select(F.col("d").alias("node"), "a"), "node", "left"
        )
        .join(hub.select(F.col("n").alias("node"), "h"), "node", "left")
        .select(
            "node",
            F.coalesce("a", F.lit(0)).alias("authority"),
            F.coalesce("h", F.lit(0)).alias("hub"),
        )
    )


def time_respecting_reach(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    ts_col: str = "t",
    horizon: int = 0,
) -> DataFrame:
    """Two-hop time-respecting reachability counts.

    ``u`` reaches ``w`` iff edges ``u→v @ t1`` and ``v→w @ t2`` exist
    with ``t1 ≤ t2`` and (when ``horizon > 0``) ``t2 − t1 ≤ horizon``
    — the temporal-graph semantics (Holme & Saramäki 2012) behind
    contact tracing, defect propagation, and info-flow audits, where
    static two-hop counts (``two_hop_counts``) overcount paths that
    run backwards in time.  Self-reach ``w == u`` is excluded.

    Returns ``{src}, n_reachable`` (exact distinct count of two-hop
    endpoints).  Timestamps are integers (days, epoch µs — caller's
    unit; ``horizon`` is in the same unit).

    Scale: one equi-join on the middle node + distinct-aggregate.
    The wedge fan-out through a hub is the same O(deg²) hazard as
    static two-hop, but the time band prunes it: only pairs within
    ``horizon`` survive, so sizing the horizon bounds the blow-up
    long before the join materializes output (the predicate is
    evaluated join-side, not post-hoc).  Hot middle nodes beyond that
    are AQE skew-join territory.
    """
    e1 = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("m"),
        F.col(ts_col).alias("t1"),
    )
    e2 = edges.select(
        F.col(src).alias("m"), F.col(dst).alias("w"),
        F.col(ts_col).alias("t2"),
    )
    cond = (F.col("t1") <= F.col("t2")) & (F.col("u") != F.col("w"))
    if horizon > 0:
        cond = cond & (F.col("t2") - F.col("t1") <= F.lit(horizon))
    return (
        e1.join(e2, "m")
        .filter(cond)
        .groupBy("u")
        .agg(F.count_distinct("w").alias("n_reachable"))
        .select(F.col("u").alias(src), "n_reachable")
    )


def group_medoids(
    members: DataFrame,
    items: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "group_id",
    set_col: str = "toks",
    max_group: int = 1000,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Medoid per near-dup group: the member minimizing the exact sum
    of set symmetric-difference distances to its groupmates.

    Survivor selection usually keeps the highest-quality or lowest-id
    member (``select_survivors``); when groups mix paraphrases the
    better canonical pick is the *medoid* — the most central text.
    Distance is ``|A| + |B| − 2·|A∩B|`` over the item's token/shingle
    set: exact integers, no cosine floats, so the argmin (ties →
    ascending id) is partition-invariant.

    Pairwise work is confined *within* groups (one self-equi-join on
    ``group_col``), so cost is Σ g² over group sizes — the same
    bounded-candidate argument the LSH verify stage makes.  Groups
    larger than ``max_group`` are excluded up front (returned with
    ``medoid`` NULL) rather than silently exploding the join: a
    boilerplate flood that collapses 10⁶ docs into one group is an
    upstream capping problem (``cap_hot_buckets``), not a medoid one.

    ``members``: ``(id, group)``; ``items``: ``(id, set_col array)``.
    Returns ``{group_col}, medoid, group_size, sum_dist`` (``sum_dist``
    NULL for excluded giants).

    ``checkpoint_mode`` — lineage-truncation policy for the
    multi-consumer intermediates (the membership and the tagged
    member-set frame), per ``llmdata.checkpointing``: ``"local"``
    (default) / ``"reliable"`` / ``"none"``.  Retention note: the
    default ``localCheckpoint`` blocks stay pinned on executors for
    the session once the plan executes — a long-lived session calling
    this in a loop should pass ``"reliable"`` (checkpoint-dir storage,
    cleanable) or ``"none"`` (pure lazy plan, re-derivation cost).
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    # materialize the 2-column membership: it feeds the size count,
    # the tagged join, the singleton branch and the giant branch, and
    # the caller's ``members`` is typically a full connected-components
    # pipeline that would otherwise re-run once per reference
    m = materialize(
        members.select(
            F.col(id_col).alias("id"), F.col(group_col).alias("g")
        ),
        checkpoint_mode,
    )
    sizes = m.groupBy("g").agg(F.count(F.lit(1)).alias("group_size"))
    ok = sizes.filter(F.col("group_size") <= max_group)
    # materialize the tagged (member, shingle-set) frame: BOTH sides
    # of the within-group pair join read it, and Spark re-embeds the
    # whole upstream pipeline (the caller's component groups AND the
    # shingle computation) once per side — measured on the r11
    # baseline: 11 SortMergeJoins / 17 Exchanges for one call, the
    # shingles computed twice (optimization guide §2.4; the
    # winnow/jaccard shingle-once discipline)
    tagged = materialize(
        m.join(ok, "g").join(
            items.select(
                F.col(id_col).alias("id"), F.col(set_col).alias("s")
            ),
            "id",
        ),
        checkpoint_mode,
    )
    a = tagged.select(
        "g", F.col("id").alias("ia"), F.col("s").alias("sa"),
        "group_size",
    )
    b = tagged.select(
        "g", F.col("id").alias("ib"), F.col("s").alias("sb")
    )
    dist = (
        F.size("sa") + F.size("sb")
        - 2 * F.size(F.array_intersect("sa", "sb"))
    )
    sums = (
        a.join(b, "g")
        .filter(F.col("ia") != F.col("ib"))
        .groupBy("g", "ia", "group_size")
        .agg(F.sum(dist).alias("d"))
    )
    wg = Window.partitionBy("g").orderBy(F.asc("d"), F.asc("ia"))
    best = (
        sums.withColumn("rk", F.row_number().over(wg))
        .filter(F.col("rk") == 1)
        .select(
            F.col("g").alias(group_col),
            F.col("ia").alias("medoid"),
            "group_size",
            F.col("d").alias("sum_dist"),
        )
    )
    # singletons never enter the pair join (ia != ib empties them):
    # they are their own medoid with distance 0
    singles = (
        m.join(ok.filter(F.col("group_size") == 1), "g")
        .select(
            F.col("g").alias(group_col),
            F.col("id").alias("medoid"),
            F.lit(1).alias("group_size"),
            F.lit(0).cast("long").alias("sum_dist"),
        )
    )
    giants = sizes.filter(F.col("group_size") > max_group).select(
        F.col("g").alias(group_col),
        F.lit(None).cast(m.schema["id"].dataType).alias("medoid"),
        "group_size",
        F.lit(None).cast("long").alias("sum_dist"),
    )
    return best.unionByName(singles).unionByName(giants)


def deterministic_walks(
    edges: DataFrame,
    seeds: DataFrame,
    node_col: str = "node",
    src: str = "src",
    dst: str = "dst",
    walks_per_seed: int = 2,
    length: int = 3,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Hash-guided random walks — the DeepWalk/node2vec corpus step
    made deterministic.

    Embedding pipelines sample walks with an RNG, which makes shards
    unreproducible; here step *i* of walk *w* from seed *s* moves to
    the out-neighbor minimizing ``md5(s ‖ w ‖ i ‖ neighbor)`` — a
    uniform-looking but md5-stable choice, so regenerating any shard
    yields byte-identical walks (the same contract as
    ``negative_sample``).  Dead ends simply stop the walk.

    Returns ``seed, walk, path, steps``: ``path`` the visited node
    array (seed first), ``steps`` the edges actually taken (≤ length).

    Scale: ``length`` keyed equi-joins (state ⋈ edges on the current
    node) each followed by a per-(seed, walk) min-struct aggregate —
    no driver state, state frame stays |seeds|·walks_per_seed rows.
    Hub fan-out in the join is one row per neighbor *before* the min
    collapses it; hot hubs are AQE skew territory, and length is the
    loop bound.  State is MATERIALIZED once per step (per
    ``checkpoint_mode``): each iteration consumes it twice (the step
    join and the dead-end anti-join), so an unmaterialized tree would
    re-execute the whole walk prefix per branch per step — measured
    6.0 s → materialized 3.7 s warm at sf0.1 on the q278 graph.
    """
    state = seeds.select(
        F.col(node_col).alias("seed"),
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_seed - 1))
        ).alias("walk"),
    ).select(
        "seed",
        "walk",
        F.col("seed").alias("cur"),
        F.array(F.col("seed")).alias("path"),
    )
    e = materialize(
        edges.select(F.col(src).alias("cur"), F.col(dst).alias("nxt")),
        checkpoint_mode,
    )
    for i in range(1, length + 1):
        state = materialize(state, checkpoint_mode)
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("seed").cast("string"),
                        F.col("walk").cast("string"),
                        F.lit(str(i)),
                        F.col("nxt").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        stepped = (
            state.join(e, "cur")
            .groupBy("seed", "walk")
            .agg(
                F.min(F.struct(h.alias("h"), F.col("nxt").alias("n")))
                .alias("pick"),
                F.first("path").alias("path"),
            )
            .select(
                "seed",
                "walk",
                F.col("pick.n").alias("cur"),
                F.concat(
                    "path", F.array(F.col("pick.n"))
                ).alias("path"),
            )
        )
        # dead-ended walks keep their shorter path (left anti side)
        ended = state.join(
            stepped.select("seed", "walk"), ["seed", "walk"], "left_anti"
        )
        state = stepped.unionByName(ended)
    return state.select(
        "seed", "walk", "path", (F.size("path") - 1).alias("steps")
    )


def adamic_adar(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_degree: int | None = DEFAULT_MAX_DEGREE,
    scale: int = 1_000_000_000,
    checkpoint_mode: str = "local",
) -> DataFrame:
    """Adamic–Adar link prediction over an undirected edge list: for
    every non-adjacent-or-not pair (u, w) with ≥ 1 common neighbor,
    ``AA(u, w) = Σ_{v ∈ N(u) ∩ N(w)} 1 / ln(deg(v))`` — common
    neighbors discounted by how promiscuous they are (a shared hub
    says little; a shared degree-2 friend says a lot).

    Exactness contract: each term is QUANTIZED to integer
    ``aa_units = floor(scale / ln(deg) + 0.5)`` before summation, so
    the per-pair total is an order-independent integer sum — the same
    portability idiom as ``grouped_linreg``'s integer coding (a double
    sum's accumulation order differs between engines and between
    partitionings of the same engine).  Report ``aa_units / scale``
    for display; compare on ``aa_units``.

    Plan: degrees (one groupBy), wedge join through the middle vertex
    (one shuffle on v), per-pair integer sum.  Wedge fan-out is
    Σ deg(v)² — the hub hazard every triangle/2-hop job has;
    ``max_degree`` drops hub MIDDLES before the self-join (their
    ln-discounted terms are the smallest anyway, but the capped result
    is a LOWER BOUND and pairs reachable only through hubs vanish —
    same explicit-truncation contract as ``cap_hot_buckets``).  The
    cap is ON BY DEFAULT (``DEFAULT_MAX_DEGREE`` = 1024) so a
    graph-scale caller gets the hub guard without opting in; pass
    ``max_degree=None`` explicitly for the exact uncapped semantics.
    Degree-1 middles cannot form a wedge (need two distinct
    neighbors), so ln(deg) ≥ ln 2 > 0 — no division hazard.

    Returns ``id_a, id_b, n_common, aa_units`` with ``id_a < id_b``.

    ``checkpoint_mode`` — lineage-truncation policy for the symmetric
    edge list and adjacency (each feeds 2+ consumers), per
    ``llmdata.checkpointing``: ``"local"`` (default) / ``"reliable"``
    / ``"none"``.  Retention note: the default ``localCheckpoint``
    blocks stay pinned on executors for the session once the plan
    executes — a long-lived session calling this in a loop should
    pass ``"reliable"`` (checkpoint-dir storage, cleanable) or
    ``"none"`` (pure lazy plan, re-derivation cost).
    """
    from db_factfinder_spark.llmdata.checkpointing import materialize

    e = (
        edges.filter(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
    )
    # materialize the symmetric edge list: it feeds the degree count
    # AND both sides of the wedge self-join, and Spark re-embeds the
    # whole upstream pipeline (caller joins + distinct) at every
    # reference — the r11 baseline plan re-scanned the source parquet
    # 16 times for one call (the shingle-once discipline of
    # winnow_pairs/jaccard_pairs, optimization guide §2.4)
    sym = materialize(
        e.union(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        ).distinct(),
        checkpoint_mode,
    )
    deg = sym.groupBy(F.col("a").alias("v")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    if max_degree is not None:
        # one-time plan-level marker, like cap_hot_buckets — but with
        # its OWN flag: sharing dedup._CAP_LOGGED would let whichever
        # of the two logs first suppress the other's distinct
        # lower-bound-semantics message in the same process
        global _AA_CAP_LOGGED
        if not _AA_CAP_LOGGED:
            _AA_CAP_LOGGED = True
            import logging

            logging.getLogger(__name__).info(
                "adamic_adar: hub cap %d is active — scores are a "
                "LOWER BOUND if any middle vertex exceeds the cap; "
                "pass max_degree=None for exact semantics",
                max_degree,
            )
        deg = deg.filter(F.col("deg") <= max_degree)
    # adjacency keyed by the middle vertex, each row carrying the
    # middle's quantized discount so the wedge join needs no third
    # join; materialized because the wedge self-join reads it twice
    # (x and y sides) and would otherwise run the degree groupBy +
    # join once per side
    adj = materialize(
        sym.select(F.col("b").alias("v"), F.col("a").alias("u")).join(
            deg, "v"
        ),
        checkpoint_mode,
    )
    term = F.floor(
        F.lit(float(scale)) / F.log(F.col("x.deg").cast("double")) + 0.5
    ).cast("long")
    wedges = (
        adj.alias("x")
        .join(
            adj.select(
                F.col("v").alias("v2"), F.col("u").alias("w")
            ).alias("y"),
            F.col("x.v") == F.col("y.v2"),
        )
        .filter(F.col("x.u") < F.col("y.w"))
    )
    return (
        wedges.groupBy(
            F.col("x.u").alias("id_a"), F.col("y.w").alias("id_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(term).alias("aa_units"),
        )
    )


def modularity_score(
    edges: DataFrame,
    members: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "group_id",
    quantize: int = 1_000_000_000_000,
) -> DataFrame:
    """Newman modularity Q of a clustering over an undirected simple
    graph — the "are these clusters denser than chance" audit for
    near-dup groups / kNN communities:

      Q = Σ_c [ L_c/m − (d_c / 2m)² ]

    (L_c intra-cluster edges, d_c cluster degree sum, m total edges).
    Unclustered vertices count as singletons (no intra edges; their
    degree still burns expectation), matching the usual convention.

    Exactness: L_c, d_c, m are exact integers; each cluster term is a
    mirrored double expression QUANTIZED to integer units before the
    cluster sum (order-independent — the portable-sum idiom).

    Plan: degrees (one groupBy), membership join on each endpoint
    (two broadcastable joins when the membership table is dimension
    sized), per-cluster aggregate, integer sum.  Returns one row:
    ``n_clusters, m_edges, q_units, modularity``.
    """
    from pyspark.sql import Window as _W  # noqa: F401 (parity w/ file style)

    e = (
        edges.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    mem = members.select(
        F.col(id_col).alias("v"),
        F.col(group_col).cast("string").alias("g"),
    )
    # effective cluster of a vertex: its group, else itself (singleton)
    deg = (
        e.select(F.col("a").alias("v"))
        .union(e.select("b"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    dv = deg.join(mem, "v", "left").withColumn(
        "gc",
        F.coalesce(
            F.col("g"), F.concat(F.lit("solo:"), F.col("v").cast("string"))
        ),
    )
    d_c = dv.groupBy("gc").agg(F.sum("deg").alias("d_sum"))
    ga = mem.select(F.col("v").alias("a"), F.col("g").alias("g_a"))
    gb = mem.select(F.col("v").alias("b"), F.col("g").alias("g_b"))
    intra = (
        e.join(ga, "a", "left")
        .join(gb, "b", "left")
        .withColumn(
            "gc",
            F.when(
                F.col("g_a").isNotNull() & (F.col("g_a") == F.col("g_b")),
                F.col("g_a"),
            ),
        )
        .filter(F.col("gc").isNotNull())
        .groupBy("gc")
        .agg(F.count(F.lit(1)).alias("l_c"))
    )
    m_tot = e.agg(F.count(F.lit(1)).alias("m"))
    per = (
        d_c.join(intra, "gc", "left")
        .withColumn("l_c", F.coalesce("l_c", F.lit(0)))
        .crossJoin(F.broadcast(m_tot))
    )
    term = (
        F.col("l_c").cast("double") / F.col("m").cast("double")
        - (
            F.col("d_sum").cast("double")
            / (F.lit(2.0) * F.col("m").cast("double"))
        )
        * (
            F.col("d_sum").cast("double")
            / (F.lit(2.0) * F.col("m").cast("double"))
        )
    )
    unit = F.floor(term * F.lit(float(quantize)) + 0.5).cast("long")
    return (
        per.select(unit.alias("u"), "m")
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("n_clusters"), F.sum("u").alias("qu"))
        .select(
            F.col("n_clusters").cast("long").alias("n_clusters"),
            F.col("m").cast("long").alias("m_edges"),
            F.col("qu").alias("q_units"),
            (F.col("qu").cast("double") / F.lit(float(quantize))).alias(
                "modularity"
            ),
        )
    )
