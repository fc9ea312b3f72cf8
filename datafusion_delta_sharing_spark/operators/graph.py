"""Graph operators over relational edge lists.

Triangle counting — the standard distributed-graph benchmark op — over a
co-occurrence graph derived relationally (parts appearing in the same
order). The scalable shape: build the distinct undirected edge list with
an ordered (a < b) convention, then close wedges with two equi-joins
(edge ⋈ edge on the middle vertex, verified against the third edge). All
joins shuffle on vertex keys; the a<b<c ordering counts each triangle
exactly once. Hot vertices (a part in every order) blow up the wedge
join — the ``max_degree`` cut drops them first, the same posting-list
discipline as the dedup shingle cut.

Connected components (iterative min-label propagation) lives in
operators/dedup.py; this module holds the one-shot relational graph ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cooccurrence_edges(df: DataFrame, group_col: str, item_col: str,
                       max_degree: int | None = None) -> DataFrame:
    """Distinct undirected edges (a < b) between items sharing a group.
    Per-group pair generation is a self-join within the group key —
    bounded by the largest group's item count, not the table size."""
    items = df.select(F.col(group_col).alias("g"),
                      F.col(item_col).alias("i")).distinct()
    a = items.select("g", F.col("i").alias("a"))
    b = items.select("g", F.col("i").alias("b"))
    edges = (a.join(b, "g")
             .filter(F.col("a") < F.col("b"))
             .select("a", "b").distinct())
    if max_degree is not None:
        edges = degree_cut(edges, max_degree)
    return edges


def vertex_degrees(edges: DataFrame) -> DataFrame:
    """(v, d) degree table of an ordered (a < b) edge list — the one
    shared definition behind the cut and its dropped-vertex proof (a
    drift between the two would make n_dropped_vertices lie about what
    the cut removed)."""
    return (edges.select(F.col("a").alias("v"))
            .unionAll(edges.select(F.col("b").alias("v")))
            .groupBy("v").agg(F.count(F.lit(1)).alias("d")))


def degree_cut(edges: DataFrame, max_degree: int,
               degrees: DataFrame | None = None) -> DataFrame:
    """Edges with both endpoints of degree <= max_degree. Pass a shared
    ``vertex_degrees`` result to compute degrees once across the cut and
    ``dropped_vertex_count``."""
    deg = vertex_degrees(edges) if degrees is None else degrees
    keep = deg.filter(F.col("d") <= max_degree).select("v")
    return (edges.join(keep.withColumnRenamed("v", "a"), "a")
            .join(keep.withColumnRenamed("v", "b"), "b")
            .select("a", "b"))


def triangle_count(edges: DataFrame) -> DataFrame:
    """One row (n_edges, n_wedges, n_triangles) for an ordered (a < b)
    edge list. Wedges a<b<c from edges (a,b)+(b,c); triangles close the
    wedge with (a,c). Two shuffles on vertex keys.

    Deliberately NOT checkpointed (r10 optimization pass): the edge
    list's four references share one exchange at runtime (measured —
    an explicit localCheckpoint ran ~20% slower by adding a job and a
    materialization barrier), and the wedge table is the quadratic
    intermediate that must never be materialized."""
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y").select("x", "y", "z")
    e3 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tris = wedges.join(e3, ["x", "z"])
    return (edges.agg(F.count(F.lit(1)).alias("n_edges"))
            .crossJoin(wedges.agg(F.count(F.lit(1)).alias("n_wedges")))
            .crossJoin(tris.agg(F.count(F.lit(1)).alias("n_triangles"))))


def pagerank_int(edges: DataFrame, iterations: int = 3,
                 scale: int = 1_000_000, top_k: int = 50) -> DataFrame:
    """Fixed-iteration PageRank in scaled integer arithmetic: rank starts
    at ``scale`` per vertex; each round r'(v) = 0.15*scale +
    floor(0.85 * sum(r(u) // outdeg(u)) over in-neighbors u). Floor
    division makes every round bit-exact on any engine — iterative graph
    algorithms are normally un-oracle-able because float summation order
    drifts; integers close that gap (the cost: up to outdeg units of rank
    mass rounded away per vertex per round, irrelevant for ranking).

    Scale shape: each round is one join edge⋈rank on the source vertex
    and one groupBy on the destination — the classic distributed PageRank
    exchange. Unrolled ``iterations`` times; for long chains insert
    localCheckpoint like dedup.connected_components.

    The adjacency, degree and vertex tables are ``localCheckpoint``-ed
    ONCE up front (r10 optimization): they are loop constants referenced
    in every round, and the lazy form re-derived the edge list — for the
    co-occurrence queries a per-group self-join — once per reference
    (the unrolled 3-round plan carried ~90 Exchanges and re-planned the
    edge subtree ~10x; materializing the three constants collapses it
    to the per-round join/agg exchanges only)."""
    de = (edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
          .unionAll(edges.select(F.col("b").alias("src"),
                                 F.col("a").alias("dst")))
          ).localCheckpoint(eager=False)
    deg = (de.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
           .localCheckpoint(eager=False))
    verts = (de.select(F.col("src").alias("v")).distinct()
             .localCheckpoint(eager=False))
    base = (15 * scale) // 100
    rank = verts.withColumn("rank", F.lit(scale).cast("long"))
    for _ in range(iterations):
        contrib = (de.join(rank, de.src == rank.v)
                   .join(deg, "src")
                   .select(F.col("dst").alias("v"),
                           F.expr("rank div outdeg").alias("c")))
        summed = contrib.groupBy("v").agg(F.sum("c").alias("s"))
        rank = (verts.join(summed, "v", "left")
                .select("v", (F.lit(base)
                              + F.expr("(85 * coalesce(s, 0)) div 100"))
                        .cast("long").alias("rank")))
    return (rank.orderBy(F.desc("rank"), "v").limit(top_k))


def pagerank_int_sql(group_source_sql: str, group_col: str, item_col: str,
                     iterations: int = 3, scale: int = 1_000_000,
                     top_k: int = 50) -> str:
    """DuckDB mirror of cooccurrence_edges (no cut) + pagerank_int, with
    the iteration loop unrolled into chained CTEs."""
    base = (15 * scale) // 100
    ctes = [f"""
    items AS (
        SELECT DISTINCT {group_col} AS g, {item_col} AS i
        FROM {group_source_sql}
    ), edges AS (
        SELECT DISTINCT l.i AS a, r.i AS b
        FROM items l JOIN items r ON l.g = r.g AND l.i < r.i
    ), de AS (
        SELECT a AS src, b AS dst FROM edges
        UNION ALL SELECT b AS src, a AS dst FROM edges
    ), deg AS (SELECT src, count(*) AS outdeg FROM de GROUP BY src),
    verts AS (SELECT DISTINCT src AS v FROM de),
    r0 AS (SELECT v, CAST({scale} AS BIGINT) AS rank FROM verts)"""]
    for i in range(1, iterations + 1):
        ctes.append(f"""
    r{i} AS (
        SELECT verts.v,
               CAST({base} + (85 * coalesce(s.s, 0)) // 100 AS BIGINT)
                   AS rank
        FROM verts LEFT JOIN (
            SELECT de.dst AS v,
                   CAST(sum(r{i - 1}.rank // deg.outdeg) AS BIGINT) AS s
            FROM de
            JOIN r{i - 1} ON de.src = r{i - 1}.v
            JOIN deg ON de.src = deg.src
            GROUP BY de.dst
        ) s ON verts.v = s.v
    )""")
    return ("WITH " + ",".join(ctes)
            + f"\n    SELECT v, rank FROM r{iterations}"
            f"\n    ORDER BY rank DESC, v LIMIT {top_k}")


def dropped_vertex_count(edges: DataFrame, max_degree: int,
                         degrees: DataFrame | None = None) -> DataFrame:
    """One-row (n_dropped_vertices) — how many vertices of an UNCUT edge
    list the ``max_degree`` cut would remove. Returned alongside the cut
    triangle counts so the correctness artifact itself proves the cut was
    non-vacuous (VERDICT r3 #5)."""
    deg = vertex_degrees(edges) if degrees is None else degrees
    return (deg.filter(F.col("d") > max_degree)
            .agg(F.count(F.lit(1)).alias("n_dropped_vertices")))


def _triangle_sql(group_source_sql: str, group_col: str, item_col: str,
                  max_degree: int | None) -> str:
    """One generator for both triangle mirrors — the shared wedge/closure
    CTE text exists exactly once, so a fix to the join predicates cannot
    drift between the cut and no-cut forms."""
    if max_degree is None:
        cut_ctes = ""
        edge_src = "edges0"
        dropped_col = ""
    else:
        cut_ctes = f""", deg AS (
        SELECT v, count(*) AS d FROM (
            SELECT a AS v FROM edges0 UNION ALL SELECT b AS v FROM edges0
        ) GROUP BY v
    ), keep AS (SELECT v FROM deg WHERE d <= {max_degree}),
    edges AS (
        SELECT e.a, e.b FROM edges0 e
        JOIN keep ka ON e.a = ka.v
        JOIN keep kb ON e.b = kb.v
    )"""
        edge_src = "edges"
        dropped_col = f""",
           (SELECT CAST(count(*) AS BIGINT) FROM deg
            WHERE d > {max_degree}) AS n_dropped_vertices"""
    return f"""
    WITH items AS (
        SELECT DISTINCT {group_col} AS g, {item_col} AS i
        FROM {group_source_sql}
    ), edges0 AS (
        SELECT DISTINCT l.i AS a, r.i AS b
        FROM items l JOIN items r ON l.g = r.g AND l.i < r.i
    ){cut_ctes}, wedges AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM {edge_src} e1 JOIN {edge_src} e2 ON e1.b = e2.a
    ), tris AS (
        SELECT 1 FROM wedges w
        JOIN {edge_src} e ON w.x = e.a AND w.z = e.b
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM {edge_src}) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS n_wedges,
           (SELECT CAST(count(*) AS BIGINT) FROM tris) AS n_triangles{dropped_col}
    """


def triangle_count_degcut_sql(group_source_sql: str, group_col: str,
                              item_col: str, max_degree: int) -> str:
    """DuckDB mirror of cooccurrence_edges WITH the degree cut +
    triangle_count + dropped_vertex_count: the hash check covers the cut
    semantics, not just the wedge math."""
    return _triangle_sql(group_source_sql, group_col, item_col, max_degree)


def triangle_count_sql(group_source_sql: str, group_col: str,
                       item_col: str) -> str:
    """DuckDB mirror of cooccurrence_edges (no degree cut) + triangle_count."""
    return _triangle_sql(group_source_sql, group_col, item_col, None)


def bfs_hop_counts(edges: DataFrame, seeds: DataFrame,
                   max_hops: int) -> DataFrame:
    """Multi-source BFS over an ordered (a < b) undirected edge list:
    ``(hops, n_vertices)`` — how many vertices are first reached at each
    hop distance 0..max_hops from the seed set.

    The distributed-BFS shape: each round equi-joins the current frontier
    with the (bidirectional) adjacency list on the vertex key, distincts
    the neighbor set, and anti-joins the visited set — one hash shuffle
    per round, never a path enumeration (a recursive path expansion is
    combinatorial on dense graphs; level-synchronous frontier BFS is
    linear in edges per round). Each round's frontier is
    ``localCheckpoint``-ed (the connected_components pattern): without
    it, hop N's plan re-derives every earlier frontier — and the edge
    list feeding it — once per reference, and the lazy plan grows
    multiplicatively with hop count.

    ``seeds`` must be a single-column (v) DataFrame; seed vertices absent
    from the edge list still count at hops 0 (a seed is reached by
    definition).
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    # loop constant, referenced every hop: materialize once instead of
    # re-deriving the edge list per round (r10 optimization — see
    # pagerank_int)
    adj = (edges.select(F.col("a").alias("v"), F.col("b").alias("w"))
           .unionAll(edges.select(F.col("b").alias("v"),
                                  F.col("a").alias("w")))
           ).localCheckpoint(eager=False)
    frontier = seeds.select("v").distinct().localCheckpoint(eager=False)
    visited = frontier.withColumn("hops", F.lit(0))
    for h in range(1, max_hops + 1):
        nxt = (frontier.join(adj, "v")
               .select(F.col("w").alias("v")).distinct()
               .join(visited.select("v"), "v", "left_anti")
               .localCheckpoint(eager=False))
        visited = visited.unionByName(nxt.withColumn("hops", F.lit(h)))
        frontier = nxt
    return (visited.groupBy("hops")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vertices")))


def bellman_ford_dists(edges: DataFrame, seeds: DataFrame,
                       max_hops: int) -> DataFrame:
    """Bounded Bellman-Ford over a weighted, ordered (a < b, cost)
    undirected edge list: ``(v, dist)`` — the minimum path cost from the
    seed set over paths of at most ``max_hops`` edges (VERDICT r7 #7).

    The distributed shape extends :func:`bfs_hop_counts` from reachability
    to weighted cost: each round equi-joins the FRONTIER (vertices whose
    distance improved last round — relaxing from settled vertices again
    can only rediscover known costs) with the bidirectional adjacency
    list, min-merges the candidate costs into the distance table, and
    takes the improved rows as the next frontier. One hash shuffle per
    round, never a path enumeration. Costs are INTEGER so every round is
    bit-exact on any engine (the pagerank_int discipline — float path
    sums would drift with combination order and be un-oracle-able).

    The merged distance table is ``localCheckpoint``-ed per round via the
    connected_components pattern: checkpoint the merged frame FIRST, then
    derive both the next distances and the improved-frontier from the
    materialized result — a lazy loop re-derives every earlier round's
    join once per reference and the plan grows multiplicatively.
    """
    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    # loop constant, referenced every hop: materialize once instead of
    # re-deriving the (weighted) edge list per round (r10 optimization —
    # see pagerank_int)
    adj = (edges.select(F.col("a").alias("src"), F.col("b").alias("dst"),
                        F.col("cost"))
           .unionAll(edges.select(F.col("b").alias("src"),
                                  F.col("a").alias("dst"), F.col("cost")))
           ).localCheckpoint(eager=False)
    dist = (seeds.select("v").distinct()
            .withColumn("d", F.lit(0).cast("long"))
            .localCheckpoint(eager=False))
    frontier = dist
    for _ in range(max_hops):
        cand = (frontier.join(adj, frontier.v == adj.src)
                .select(F.col("dst").alias("v"),
                        (F.col("d") + F.col("cost")).alias("nd")))
        best = cand.groupBy("v").agg(F.min("nd").alias("nd"))
        merged = (dist.join(best, "v", "full_outer")
                  .select("v", F.col("d").alias("od"),
                          F.least(F.coalesce("d", "nd"),
                                  F.coalesce("nd", "d")).alias("d"))
                  .localCheckpoint(eager=False))
        dist = merged.select("v", "d")
        frontier = (merged.filter(F.col("od").isNull()
                                  | (F.col("d") < F.col("od")))
                    .select("v", "d"))
    return dist.select("v", F.col("d").cast("long").alias("dist"))


def bellman_ford_dists_sql(edges_sql: str, seeds_sql: str,
                           max_hops: int) -> str:
    """DuckDB mirror of :func:`bellman_ford_dists`: the round loop
    unrolled into chained CTEs, each one min-merge over (previous dists ∪
    one-edge relaxations). The mirror relaxes from ALL current vertices
    each round where the Spark side relaxes only from the frontier — the
    results are identical by the Bellman-Ford invariant (a cost that
    improves at round i extends a cost that improved at round i-1), so
    hash equality also proves the frontier optimization lossless."""
    ctes = [f"""adj AS (
        SELECT a AS src, b AS dst, cost FROM ({edges_sql})
        UNION ALL SELECT b AS src, a AS dst, cost FROM ({edges_sql})
    ), d0 AS (
        SELECT DISTINCT v, CAST(0 AS BIGINT) AS d FROM ({seeds_sql})
    )"""]
    for i in range(1, max_hops + 1):
        ctes.append(f"""
    d{i} AS (
        SELECT v, min(d) AS d FROM (
            SELECT v, d FROM d{i - 1}
            UNION ALL
            SELECT adj.dst AS v, d{i - 1}.d + adj.cost AS d
            FROM adj JOIN d{i - 1} ON adj.src = d{i - 1}.v
        ) GROUP BY v
    )""")
    return ("WITH " + ",".join(ctes)
            + f"\n    SELECT v, CAST(d AS BIGINT) AS dist"
            f" FROM d{max_hops}")


def label_propagation(edges: DataFrame, rounds: int) -> DataFrame:
    """Synchronous majority-label propagation over an ordered (a < b)
    undirected edge list: ``(v, label)`` after ``rounds`` rounds —
    the classic community-detection heuristic (Raghavan et al. 2007),
    made deterministic by the (count DESC, label ASC) tie-break (the
    original's random tie-break is un-oracle-able).

    Each round: one equi-join of the labels with the bidirectional
    adjacency list, one (vertex, label) count aggregate, one per-vertex
    window pick — all shuffles on the vertex key, state bounded by the
    edge list. Labels are vertex ids (integers), so rounds are exact on
    any engine. Fixed round count, synchronous updates: every vertex
    adopts the round-(i-1) majority of its neighbors simultaneously
    (per-round localCheckpoint — the connected_components discipline).

    Differs from :func:`..dedup.connected_components` (min-label, runs to
    convergence, labels = components) — majority vote can settle DENSE
    subcommunities inside one connected component, which min-label by
    construction cannot."""
    from pyspark.sql import Window as W

    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    # loop constants, referenced every round: materialize once instead
    # of re-deriving the edge list per round (r10 optimization — see
    # pagerank_int)
    adj = (edges.select(F.col("a").alias("src"), F.col("b").alias("dst"))
           .unionAll(edges.select(F.col("b").alias("src"),
                                  F.col("a").alias("dst")))
           ).localCheckpoint(eager=False)
    verts = (adj.select(F.col("src").alias("v")).distinct()
             .localCheckpoint(eager=False))
    labels = (verts.withColumn("label", F.col("v"))
              .localCheckpoint(eager=False))
    pick_w = W.partitionBy("v").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(rounds):
        nb = (adj.join(labels.withColumnRenamed("v", "src"), "src")
              .groupBy(F.col("dst").alias("v"), "label")
              .agg(F.count(F.lit(1)).alias("cnt")))
        top = (nb.withColumn("rn", F.row_number().over(pick_w))
               .filter(F.col("rn") == 1).select("v", "label"))
        # left join + coalesce: an isolated vertex keeps its own label
        labels = (verts.join(top, "v", "left")
                  .select("v", F.coalesce("label", "v").alias("label"))
                  .localCheckpoint(eager=False))
    return labels


def label_propagation_sql(edges_sql: str, rounds: int) -> str:
    """DuckDB mirror of :func:`label_propagation` with the round loop
    unrolled into chained CTEs (same majority + tie-break per round)."""
    ctes = [f"""adj AS (
        SELECT a AS src, b AS dst FROM ({edges_sql})
        UNION ALL SELECT b AS src, a AS dst FROM ({edges_sql})
    ), verts AS (SELECT DISTINCT src AS v FROM adj),
    l0 AS (SELECT v, v AS label FROM verts)"""]
    for i in range(1, rounds + 1):
        ctes.append(f"""
    l{i} AS (
        SELECT verts.v, coalesce(t.label, verts.v) AS label
        FROM verts LEFT JOIN (
            SELECT v, label FROM (
                SELECT adj.dst AS v, l{i - 1}.label,
                       count(*) AS cnt,
                       row_number() OVER (
                           PARTITION BY adj.dst
                           ORDER BY count(*) DESC, l{i - 1}.label
                       ) AS rn
                FROM adj JOIN l{i - 1} ON adj.src = l{i - 1}.v
                GROUP BY adj.dst, l{i - 1}.label
            ) WHERE rn = 1
        ) t ON verts.v = t.v
    )""")
    return ("WITH " + ",".join(ctes)
            + f"\n    SELECT v, CAST(label AS BIGINT) AS label"
            f" FROM l{rounds}")


def bfs_hop_counts_sql(edges_sql: str, seeds_sql: str,
                       max_hops: int) -> str:
    """DuckDB mirror of :func:`bfs_hop_counts`: level-synchronous
    reachable-set CTEs (s1 = s0 ∪ neighbors(s0), ...) rather than a
    recursive path expansion — same reason as the Spark side (path
    recursion is combinatorial on dense co-occurrence graphs). Per-hop
    counts are reachable-set size deltas; zero-growth levels are
    filtered to match the Spark side's empty groupBy output."""
    ctes = [f"adj AS (SELECT a AS v, b AS w FROM ({edges_sql}) "
            f"UNION ALL SELECT b AS v, a AS w FROM ({edges_sql}))",
            f"s0 AS (SELECT DISTINCT v FROM ({seeds_sql}))"]
    for h in range(1, max_hops + 1):
        ctes.append(
            f"s{h} AS (SELECT v FROM s{h-1} UNION "
            f"SELECT adj.w AS v FROM adj "
            f"JOIN s{h-1} ON adj.v = s{h-1}.v)")
    levels = ["SELECT 0 AS hops, (SELECT count(*) FROM s0) AS n_vertices"]
    for h in range(1, max_hops + 1):
        levels.append(
            f"SELECT {h} AS hops, (SELECT count(*) FROM s{h}) "
            f"- (SELECT count(*) FROM s{h-1}) AS n_vertices")
    union = " UNION ALL ".join(levels)
    return f"""
    WITH {', '.join(ctes)}
    SELECT CAST(hops AS INT) AS hops,
           CAST(n_vertices AS BIGINT) AS n_vertices
    FROM ({union}) WHERE n_vertices > 0
    """


def kcore(edges: DataFrame, k: int, max_rounds: int) -> DataFrame:
    """Bounded k-core peeling (Seidman 1983 / Batagelj-Zaversnik) over
    an ordered (a < b) undirected edge list: repeatedly drop vertices of
    degree < k (synchronous rounds, per-round localCheckpoint) for
    ``max_rounds`` rounds, then report ONE summary row
    (n_core_vertices, n_core_edges, fixpoint_reached) — the stable flag
    compares the last two rounds' edge counts IN-PLAN, so a round
    budget too small to converge is visible in the result, never
    silent.

    Scale shape: each round is one degree aggregate (union of the two
    endpoint projections) + two semi-join-shaped equi-joins back onto
    the edge list — all shuffles on the vertex key, state bounded by
    the surviving edge list; the peeled frontier shrinks
    monotonically. The summary crossJoins are one-row scalars."""
    if k < 1 or max_rounds < 1:
        raise ValueError(f"k and max_rounds must be >= 1, got "
                         f"{k}/{max_rounds}")
    cur = edges.localCheckpoint(eager=False)
    prev = cur
    for _ in range(max_rounds):
        keep = (vertex_degrees(cur).filter(F.col("d") >= k)
                .select("v"))
        prev = cur
        cur = (cur.join(keep.withColumnRenamed("v", "a"), "a")
               .join(keep.withColumnRenamed("v", "b"), "b")
               .select("a", "b").localCheckpoint(eager=False))
    verts = (cur.select(F.col("a").alias("v"))
             .unionAll(cur.select(F.col("b").alias("v")))
             .distinct().agg(F.count(F.lit(1)).alias("n_core_vertices")))
    n_cur = cur.agg(F.count(F.lit(1)).alias("n_core_edges"))
    n_prev = prev.agg(F.count(F.lit(1)).alias("_n_prev"))
    return (verts.crossJoin(n_cur).crossJoin(n_prev)
            .select("n_core_vertices", "n_core_edges",
                    (F.col("n_core_edges") == F.col("_n_prev"))
                    .alias("fixpoint_reached")))


def kcore_sql(edges_sql: str, k: int, max_rounds: int) -> str:
    """DuckDB mirror of :func:`kcore` with the peel loop unrolled into
    chained CTEs (same degree threshold and synchronous drop per
    round). Validates like the Spark twin — max_rounds < 1 would emit
    a reference to the nonexistent CTE e-1."""
    if k < 1 or max_rounds < 1:
        raise ValueError(f"k and max_rounds must be >= 1, got "
                         f"{k}/{max_rounds}")
    ctes = [f"e0 AS (SELECT a, b FROM ({edges_sql}))"]
    for i in range(1, max_rounds + 1):
        ctes.append(f"""
    d{i} AS (
        SELECT v, count(*) AS d FROM (
            SELECT a AS v FROM e{i - 1}
            UNION ALL SELECT b AS v FROM e{i - 1}
        ) GROUP BY v
    ),
    k{i} AS (SELECT v FROM d{i} WHERE d >= {k}),
    e{i} AS (
        SELECT ee.a, ee.b FROM e{i - 1} ee
        JOIN k{i} ka ON ee.a = ka.v
        JOIN k{i} kb ON ee.b = kb.v
    )""")
    last, prev = f"e{max_rounds}", f"e{max_rounds - 1}"
    return f"""
        WITH {','.join(ctes)}
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM (
                SELECT DISTINCT v FROM (
                    SELECT a AS v FROM {last}
                    UNION ALL SELECT b AS v FROM {last})))
                AS n_core_vertices,
            (SELECT CAST(count(*) AS BIGINT) FROM {last})
                AS n_core_edges,
            (SELECT count(*) FROM {last})
                = (SELECT count(*) FROM {prev}) AS fixpoint_reached
    """
