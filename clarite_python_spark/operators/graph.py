"""Graph operators over edge-list DataFrames.

The near-dup dedup family (operators/dedup.py) grew an internal
connected-components kernel for clustering verified duplicate pairs;
this module exposes that capability as a first-class public operator
over arbitrary edge lists, plus the component-size rollup a pipeline
usually wants next ("how big are my duplicate clusters / user graphs /
entity groups?").

Scale notes (100 TB framing)
----------------------------
``connected_components`` is iterative min-label propagation: each round
is ONE shuffle join keyed on vertex id plus a map-side-combined min agg,
and converges in O(component diameter) rounds. Real-world duplicate /
identity graphs are shallow (star-ish), so the typical cost is 2-5
rounds. ``localCheckpoint`` inside the kernel truncates lineage each
round so the plan never grows with the iteration count. For adversarial
long-path graphs raise ``max_iter``; the kernel stops early the first
round no label improves.

No reference counterpart: HallLab/clarite-python has no graph surface;
this is extension-surface completeness for the dedup/identity pipeline
(the kernel itself is driver-oracle-proven through minhash_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from clarite_python_spark.operators.dedup import _min_label_components

__all__ = ["connected_components", "component_sizes"]


def connected_components(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    shortcut: bool = True,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Connected components of the undirected graph given as an edge list.

    Parameters
    ----------
    edges : DataFrame with two vertex-id columns (any orderable type;
        ids are compared with ``<`` so the component label is the MIN
        vertex id of the component — stable and meaningful).
    src_col, dst_col : the two endpoint columns.
    max_iter : safety bound on propagation rounds (the loop exits early
        at fixpoint).
    shortcut : pointer-jump labels (label(v) <- label(label(v))) after
        each neighbor round — one extra label-keyed join per round for
        O(log diameter) instead of O(diameter) rounds (default: user
        graphs are not guaranteed shallow; measured 85.7 s -> see
        BASELINE.md round-10 on a diameter-19 chain). Turn off for
        known-shallow graphs (stars, near-dup cliques) to save the join.
    driver_max_edges : edge lists at or below this bound are solved by
        a driver-side union-find instead of the propagation loop —
        identical (min-id) labels, milliseconds instead of O(log
        diameter) rounds of multi-job latency (r13). Set 0 to force the
        distributed loop.

    Returns (node, component) with one row per distinct vertex,
    ``component`` = min vertex id reachable from ``node``.
    """
    e = edges.select(
        F.col(src_col).alias("id_a"), F.col(dst_col).alias("id_b")
    ).where(F.col("id_a").isNotNull() & F.col("id_b").isNotNull())
    labels = _min_label_components(
        e, max_iter=max_iter, shortcut=shortcut,
        driver_max_edges=driver_max_edges,
    )
    return labels.select(
        F.col("id").alias("node"), F.col("label").alias("component")
    )


def component_sizes(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 50,
    shortcut: bool = True,
) -> DataFrame:
    """Size rollup of :func:`connected_components`: one row per
    component with its vertex count — the "how big are my clusters"
    question. Same single-shuffle-per-round cost plus one count agg."""
    comp = connected_components(edges, src_col, dst_col, max_iter, shortcut)
    return comp.groupBy("component").agg(
        F.count("*").cast("long").alias("n_nodes")
    )
