"""Connected components over near-duplicate pair sets.

Pairwise near-dup detection (MinHash/SimHash/embedding) yields EDGES;
a training-data pipeline needs GROUPS — transitive closures of the
pair relation — so that exactly one representative per component
survives (A~B and B~C must collapse to one keeper even when A~C was
never itself emitted as a pair).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the minimum label among
itself and its neighbors; converged when no label changes. The driver
loop only CONTROLS iteration (one count() per round for the
convergence test) — label state and the propagation join stay fully
distributed, and lineage is truncated per round (localCheckpoint) so
plans don't grow with iteration count.

Each round couples neighbor-min propagation with a pointer-doubling
shortcut (component ← component's component, a self-join on the label
table) — the label graph halves in depth every round, so convergence
takes O(log diameter) rounds instead of diameter (a 10k-node chain
converges in ~15 rounds; plain propagation would need 10k). This is
the shortcutting move of the MapReduce CC literature (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SOCC'14) grafted onto
label propagation. `max_rounds` still guards non-convergence, and
hitting it raises rather than silently returning unconverged labels.

SCALE: each round is one shuffle of the edge list on the join key plus
a groupBy on node — both keyed on doc ids (uniform). The edge list is
the OUTPUT of the near-dup stage, orders of magnitude smaller than the
corpus; components never materialize driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(src, dst) edge list → (node, component) with component = the
    minimum node id reachable through the pair relation."""
    # Symmetrize with ONE pass over the edge list: each edge explodes
    # in-row into both directions. The previous union-of-two-selects
    # scanned (and, when `edges` is an unmaterialized plan, COMPUTED)
    # the edge subtree twice, and its `.distinct()` added a full
    # exchange — duplicate edges don't change any min() below, so the
    # dedup bought nothing. All checkpoints in this loop are LAZY: the
    # convergence count is the first action each round, so
    # materialization and the convergence test fuse into one job
    # (eager checkpoints paid a separate materialization job each —
    # pure scheduling overhead, 3 jobs/round → 1).
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("a"), F.col("b").alias("b")),
                F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b").localCheckpoint(eager=False)

    # Init fuses round-0 propagation: label := min(self, neighbors)
    # straight out of the groupBy (sym is symmetric, so every node
    # appears as `a`). Typical near-dup components (pairs/triples
    # rooted at their min id) converge at init, so the loop's first
    # round is already the zero-change confirmation pass.
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("nmin"))
        .select("node", F.least("node", "nmin").alias("component"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_rounds):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        propagated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.col("component").alias("prev_component"),
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nmin"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=False)
        )
        # Convergence test on PROPAGATION alone — its fixpoint (every
        # label = min over the closed neighborhood) already implies
        # every label is the component minimum, so the confirming
        # round skips the pointer-doubling join entirely. Typical
        # near-dup graphs converge at init (pairs/triples rooted at
        # their min id), making round 1 the confirmation pass: this
        # cuts one join + one materialization off the common case.
        changed = propagated.filter(
            F.col("component") != F.col("prev_component")
        ).count()
        if changed == 0:
            return propagated.select("node", "component")
        # pointer doubling: jump each node's label to its label's
        # label — the label graph halves in depth, so deep chains
        # converge in O(log diameter) rounds. Components are
        # themselves nodes, so the self-join always resolves;
        # left-join keeps self-labeled roots.
        jump = propagated.select(
            F.col("node").alias("jnode"), F.col("component").alias("jcomp")
        )
        labels = (
            propagated.join(jump, propagated.component == jump.jnode, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("jcomp"), F.col("component")),
                ).alias("component"),
            )
            # lazy: the NEXT round's convergence count materializes it
            .localCheckpoint(eager=False)
        )
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds"
    )
