"""Graph analytics operators beyond components/PageRank (operators/dedup.py).

The reference has no graph surface (SURVEY §2.2) — these are driver-mandated
analytics extensions over derived graphs (near-dup pair graphs, co-purchase
graphs). Everything is expressed as equi-joins over edge tables so Spark
shuffles on vertex keys; no adjacency matrices, no driver-side graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triangle_participation(
    edges: DataFrame, u_col: str = "u", v_col: str = "v"
) -> DataFrame:
    """Per-node triangle counts via the degree-oriented wedge join — the
    classic distributed triangle algorithm (Schank & Wagner '05 /
    Suri-Vassilvitskii MR-style): orient every undirected edge from its
    lower-(degree, id) endpoint to the higher one, generate wedges only
    between a node's ORIENTED out-neighbours, and close them against the
    oriented edge table.

    Why orientation is the 100 TB move: unoriented wedge volume is
    Σ d(d−1)/2 — quadratic in hub degree, the thing that melts a naive
    triangle join on a skewed graph. Orientation caps every out-degree at
    O(√|E|) (a node of degree d only points to neighbours of degree ≥ d,
    and there can be at most 2√|E| such nodes), so the wedge join's
    output is O(|E|^{3/2}) worst case regardless of hub skew. All three
    stages are equi-joins keyed on vertex ids; each triangle is counted
    exactly once (at its lowest-ordered apex).

    Returns (node, degree, n_triangles) for every node on ≥1 triangle.
    """
    e = edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
        .localCheckpoint(eager=True)  # read 3x: both orientations + output
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oe = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias(
                "dst_d"
            ),
        )
        .localCheckpoint(eager=True)  # read 3x: two wedge sides + closing
    )
    e1 = oe.select("src", F.col("dst").alias("v"), F.col("dst_d").alias("vd"))
    e2 = oe.select("src", F.col("dst").alias("w"), F.col("dst_d").alias("wd"))
    wedges = e1.join(e2, "src").where(
        (F.col("vd") < F.col("wd"))
        | ((F.col("vd") == F.col("wd")) & (F.col("v") < F.col("w")))
    )
    closing = oe.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select("src", "v", "w")
    # Each triangle credits all three corners via ONE explode — the
    # 3-way unionAll form re-executed the whole wedge+closing join
    # subtree once per corner (union branches are separate plan
    # subtrees; only their exchanges get reused).
    per_node = (
        tri.select(
            F.explode(F.array(F.col("src"), F.col("v"), F.col("w"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )
    return per_node.join(deg, "node").select(
        "node", F.col("d").alias("degree"), "n_triangles"
    )


def bfs_levels(
    edges: DataFrame,
    seed: DataFrame,
    max_depth: int = 3,
    u_col: str = "u",
    v_col: str = "v",
) -> DataFrame:
    """Multi-hop BFS from a seed frame: (node, level) with the MINIMUM
    hop count, levels 0..max_depth.

    Spark-first shape: the depth is a small fixed constant, so the
    iteration unrolls into max_depth frontier-expansion joins — each one
    an equi-join of the current frontier against the (checkpointed,
    bidirectional) edge table, followed by an anti-join against the
    visited set. Every step is vertex-keyed; the frontier frame is the
    only thing that grows, and it is bounded by the reachable set. No
    driver-side adjacency, no recursion — the DuckDB oracle's WITH
    RECURSIVE proves the unrolled plan computes the same minimum levels.

    At 100 TB: each hop is one shuffle keyed on the frontier's vertex
    ids; checkpointing the frontier per hop keeps lineage flat (the
    standard iterative-algorithm discipline, same as connected
    components)."""
    bidir = (
        edges.select(F.col(u_col).alias("s"), F.col(v_col).alias("d"))
        .unionAll(
            edges.select(F.col(v_col).alias("s"), F.col(u_col).alias("d"))
        )
        .localCheckpoint(eager=True)
    )
    frontier = seed.select(F.col(seed.columns[0]).alias("node")).distinct()
    visited = frontier.withColumn("level", F.lit(0)).localCheckpoint(
        eager=True
    )
    for depth in range(1, max_depth + 1):
        nxt = (
            frontier.join(bidir, frontier.node == bidir.s)
            .select(F.col("d").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        visited = visited.unionAll(
            nxt.withColumn("level", F.lit(depth))
        ).localCheckpoint(eager=True)
        frontier = nxt
    return visited


def label_propagation(
    edges: DataFrame, rounds: int = 3, u_col: str = "u", v_col: str = "v"
) -> DataFrame:
    """Synchronous label propagation (Raghavan et al. 2007, made
    deterministic): labels start as vertex ids; each round every vertex
    adopts the MOST FREQUENT label among its neighbours, ties broken by
    the smallest label. Returns (node, label) after ``rounds`` rounds.

    Deterministic by construction (no random visit order — the classic
    source of LPA nondeterminism), so a DuckDB oracle reproduces it
    exactly with the same unrolled rounds. Spark-first shape: each round
    is one vertex-keyed equi-join (neighbour labels), one counting
    aggregate with map-side combine, and one rank-1 filter that plans as
    WindowGroupLimit (top-1 label per vertex — at most one row per
    vertex per map partition crosses the exchange). The labels frame is
    single-reference per round (each round reads only the previous
    round's output), so the rounds compose into ONE query over the
    checkpointed edge leaf — per-round checkpoints would each trigger a
    full AQE execution (jobs + planning) without saving any recompute;
    rounds is a small constant, so the unrolled plan stays shallow.
    """
    bidir = (
        edges.select(F.col(u_col).alias("s"), F.col(v_col).alias("d"))
        .unionAll(
            edges.select(F.col(v_col).alias("s"), F.col(u_col).alias("d"))
        )
        .localCheckpoint(eager=True)
    )
    labels = (
        bidir.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    from pyspark.sql.window import Window

    for _ in range(rounds):
        nbr = bidir.join(
            labels.select(F.col("node").alias("s"), "label"), "s"
        ).select(F.col("d").alias("node"), "label")
        cnt = nbr.groupBy("node", "label").agg(
            F.count(F.lit(1)).alias("c")
        )
        w = Window.partitionBy("node").orderBy(F.col("c").desc(), "label")
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels


def kcore_peel(
    edges: DataFrame, k: int = 2, rounds: int = 4,
    u_col: str = "u", v_col: str = "v",
) -> DataFrame:
    """Bounded k-core peeling: ``rounds`` synchronous rounds of removing
    every vertex with degree < k (and its edges), the textbook iterative
    peel unrolled to a fixed depth. Returns (node, degree) for the
    vertices still standing, with their residual degree.

    A full k-core decomposition iterates to a fixed point; at cluster
    scale the standard practice is a bounded number of peels (each round
    strictly shrinks the edge set, and real graphs converge in a handful
    of rounds — the oracle's recursive CTE proves the unrolled plan
    matches round for round). Each round: one degree aggregate
    (map-side combine) + two vertex-keyed semi-joins; the surviving edge
    frame is checkpointed so lineage stays flat."""
    e = edges.select(
        F.col(u_col).alias("u"), F.col(v_col).alias("v")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("dg"))
        )
        keep = deg.where(F.col("dg") >= k).select("node").localCheckpoint(
            eager=True
        )
        e = (
            e.join(keep.withColumnRenamed("node", "u"), "u", "left_semi")
            .join(keep.withColumnRenamed("node", "v"), "v", "left_semi")
            .localCheckpoint(eager=True)
        )
    return (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )


def common_neighbor_pairs(
    edges: DataFrame, cap: int = 32, u_col: str = "u", v_col: str = "v"
) -> DataFrame:
    """(a, b, n_common) common-neighbour counts for candidate pairs — the
    classic link-prediction score — over DEGREE-CAPPED adjacency lists:
    each apex contributes wedges only between its first ``cap``
    neighbours (by neighbour id, a deterministic cap), the standard
    industrial bound that keeps the apex-keyed wedge join's output under
    Σ min(d, cap)² regardless of hub skew (an uncapped wedge join is
    Σ d² — the quadratic the triangle operator dodges by orientation,
    which link prediction can't use because it must see EVERY common
    neighbour of a pair, not just lower-ordered ones). The cap filter is
    a rank-1..cap window that plans as WindowGroupLimit. Counts are
    exact on the capped graph; the oracle applies the identical cap.
    Already-adjacent pairs are anti-joined away (predicting existing
    edges is pointless).

    PRECONDITION: ``edges`` must be canonically oriented (u < v per row,
    one row per undirected edge), as ``_co_edges`` guarantees — the
    existing-edge anti-join probes (a, b) with a < b against that single
    orientation, so an unordered or bidirectional edge list would leave
    already-adjacent pairs in the output."""
    from pyspark.sql.window import Window

    bidir = (
        edges.select(F.col(u_col).alias("s"), F.col(v_col).alias("d"))
        .unionAll(
            edges.select(F.col(v_col).alias("s"), F.col(u_col).alias("d"))
        )
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("s").orderBy("d")
    adj = (
        bidir.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= cap)
        .select("s", "d")
        .localCheckpoint(eager=True)  # both wedge sides read it
    )
    e1 = adj.select("s", F.col("d").alias("a"))
    e2 = adj.select("s", F.col("d").alias("b"))
    wedges = e1.join(e2, "s").where(F.col("a") < F.col("b"))
    cn = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    existing = edges.select(
        F.col(u_col).alias("a"), F.col(v_col).alias("b")
    )
    return cn.join(existing, ["a", "b"], "left_anti")


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    u_col: str = "u",
    v_col: str = "v",
) -> DataFrame:
    """Personalized PageRank with a teleport vector over the seed set,
    in exact integer micro-units so an unrolled DuckDB CTE chain matches
    bit-for-bit (the dedup_graph_pagerank arithmetic, restricted
    teleport): pr_0(v) = 1_000_000·[v ∈ seeds];
    pr_{i+1}(v) = 150_000·[v ∈ seeds] + (17·Σ_{u~v} pr_i(u) div deg(u))
    div 20 — damping 0.85 as (17·x) div 20, per-edge contribution an
    integer division (all masses non-negative, so Spark's truncating
    `div` and DuckDB's flooring `//` agree). ``seeds`` is a 1-column
    (node) frame; unknown seed nodes simply hold teleport mass and never
    propagate (degree join drops them).

    Scale shape: the textbook distributed power iteration — slim
    checkpointed symmetrized edge list, per round one vertex-keyed
    equi-join of the CURRENT MASS FRONTIER with edges plus one
    destination-keyed aggregate (map-side combine), then a full outer
    join against the #seeds-bounded teleport frame. The mass frame is
    bounded by the seed set's i-hop reachable neighbourhood, never the
    whole graph, and every shuffle carries (node, mass) pairs only. The
    mass frame is single-reference per round, so the rounds compose
    into ONE query over the checkpointed edge/degree/teleport leaves —
    per-round checkpoints would each trigger a full AQE execution
    (jobs + planning) without saving any recompute.
    """
    bidir = (
        edges.select(F.col(u_col).alias("s"), F.col(v_col).alias("d"))
        .unionAll(
            edges.select(F.col(v_col).alias("s"), F.col(u_col).alias("d"))
        )
        .localCheckpoint(eager=True)
    )
    deg = bidir.groupBy("s").agg(F.count(F.lit(1)).alias("dg")).localCheckpoint(
        eager=True  # joined every round
    )
    tel = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("tel", F.lit(150000).cast("long"))
        .localCheckpoint(eager=True)  # #seeds rows; reused every round
    )
    pr = tel.select("node", F.lit(1000000).cast("long").alias("pr"))
    for _ in range(rounds):
        prop = (
            bidir.join(pr.select(F.col("node").alias("s"), "pr"), "s")
            .join(deg, "s")
            .groupBy("d")
            .agg(
                F.expr("cast((17 * sum(pr div dg)) div 20 as bigint)").alias(
                    "pr"
                )
            )
            .select(F.col("d").alias("node"), "pr")
        )
        # tel + prop combine via union + sum: both frames are unique-keyed
        # on node, so this equals the full-outer-join-with-coalesce form
        # row for row — and the union/aggregate shape nests across rounds
        # without the Catalyst planning blowup measured on nested full
        # outer joins (cold plan compile 24.5 s vs 8.4 s at 3 rounds).
        pr = (
            tel.select("node", F.col("tel").alias("pr"))
            .unionAll(prop)
            .groupBy("node")
            .agg(F.sum("pr").cast("long").alias("pr"))
        )
    return pr


def adamic_adar_pairs(
    edges: DataFrame, cap: int = 32, u_col: str = "u", v_col: str = "v"
) -> DataFrame:
    """(a, b, n_common, aa_micro) Adamic-Adar link-prediction scores over
    DEGREE-CAPPED adjacency lists: each apex w contributes weight
    floor(1e6 / ln(deg(w)) + 0.5) — deg is the TRUE (uncapped) degree —
    to every pair of its first ``cap`` neighbours (by neighbour id), the
    same deterministic wedge bound as common_neighbor_pairs. The per-apex
    weight is a single IEEE double op chain (identical both engines) and
    the pair score is an INTEGER SUM of those micro-unit weights, so
    ranking never depends on float summation order. Apexes of degree 1
    cannot form a wedge, so ln(1) = 0 never divides; the weight is
    guarded to 0 there anyway.

    PRECONDITION: ``edges`` canonically oriented (u < v per row, one row
    per undirected edge, as _co_edges guarantees) — the existing-edge
    anti-join probes a single orientation.
    """
    from pyspark.sql.window import Window

    bidir = (
        edges.select(F.col(u_col).alias("s"), F.col(v_col).alias("d"))
        .unionAll(
            edges.select(F.col(v_col).alias("s"), F.col(u_col).alias("d"))
        )
        .localCheckpoint(eager=True)
    )
    deg = bidir.groupBy("s").agg(F.count(F.lit(1)).alias("dg"))
    w = Window.partitionBy("s").orderBy("d")
    adj = (
        bidir.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= cap)
        .join(deg, "s")
        .select(
            "s",
            "d",
            F.when(
                F.col("dg") >= 2,
                F.floor(F.lit(1000000.0) / F.log("dg") + F.lit(0.5)),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("w_micro"),
        )
        .localCheckpoint(eager=True)  # both wedge sides read it
    )
    e1 = adj.select("s", F.col("d").alias("a"), "w_micro")
    e2 = adj.select("s", F.col("d").alias("b"))
    wedges = e1.join(e2, "s").where(F.col("a") < F.col("b"))
    aa = wedges.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_common"),
        F.sum("w_micro").cast("long").alias("aa_micro"),
    )
    existing = edges.select(
        F.col(u_col).alias("a"), F.col(v_col).alias("b")
    )
    return aa.join(existing, ["a", "b"], "left_anti")


def triangle_edge_counts(
    edges: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    deg: DataFrame | None = None,
) -> DataFrame:
    """Per-EDGE triangle counts (common-neighbor counts) via the same
    degree-oriented wedge join as triangle_participation — each closed
    triangle (a, b, c) contributes one count to each of its three edges,
    re-canonicalized to the undirected (least, greatest) form so the
    output joins back onto the canonical edge list. Same O(|E|^{3/2})
    wedge bound under any hub skew; returns (u, v, common) for edges on
    >= 1 triangle. ``deg`` lets a caller that already materialized the
    (node, d) degree frame pass it in instead of paying a second
    edge-scan aggregate (it must be the degree frame OF ``edges``)."""
    e = edges.select(F.col(u_col).alias("u"), F.col(v_col).alias("v"))
    if deg is None:
        deg = (
            e.select(F.col("u").alias("node"))
            .unionAll(e.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
            .localCheckpoint(eager=True)
        )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oe = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias(
                "dst_d"
            ),
        )
        .localCheckpoint(eager=True)
    )
    e1 = oe.select("src", F.col("dst").alias("v"), F.col("dst_d").alias("vd"))
    e2 = oe.select("src", F.col("dst").alias("w"), F.col("dst_d").alias("wd"))
    wedges = e1.join(e2, "src").where(
        (F.col("vd") < F.col("wd"))
        | ((F.col("vd") == F.col("wd")) & (F.col("v") < F.col("w")))
    )
    closing = oe.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tri = wedges.join(closing, ["v", "w"]).select("src", "v", "w")
    # One explode credits all three edges of each triangle — the 3-way
    # unionAll form re-executed the wedge+closing join subtree per edge
    # (same fix as triangle_participation's corner counts).
    pair = lambda a, b: F.struct(
        F.least(F.col(a), F.col(b)).alias("u"),
        F.greatest(F.col(a), F.col(b)).alias("v"),
    )
    pairs3 = tri.select(
        F.explode(
            F.array(pair("src", "v"), pair("src", "w"), pair("v", "w"))
        ).alias("p")
    ).select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
    return pairs3.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("long").alias("common")
    )
